package graft

import graft.operators.Search
import org.apache.spark.sql.functions._

/** Inverted index + BM25 + co-occurrence pairs (SURVEY §2
  * #20b/#20c/#20d): semantics vs naive driver-side references at
  * sf0.001, plus the structural invariants of each artifact. */
class SearchSpec extends SparkSpecBase {

  private def naiveTokens(text: String): Array[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  private def corpus() = Tables.documents(spark, sfDir)
    .select("doc_id", "text").collect()
    .map(r => (r.getLong(0), naiveTokens(r.getString(1))))

  test("inverted_index: sorted postings, df consistent, exact vs naive build") {
    // postings are a comma-joined STRING (the scalar-output house
    // rule — adjudicators can't sort/hash bare arrays); parse back.
    val idx = Search.invertedIndex(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getString(2).split(",").map(_.toLong).toSeq)).toSeq
    assert(idx.nonEmpty)
    idx.foreach { case (term, df, postings) =>
      assert(postings == postings.sorted, s"$term postings unsorted")
      assert(postings.distinct.length == postings.length, s"$term dup postings")
      assert(df == postings.length, s"$term df != postings length")
    }
    val naive = corpus()
      .flatMap { case (id, toks) => toks.distinct.map(_ -> id) }
      .groupBy(_._1).view
      .mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(idx.map(e => e._1 -> e._3).toMap == naive)
  }

  test("inverted_index_capped: exact df, prefix postings bounded by the cap") {
    val full = Search.invertedIndex(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getString(2).split(",").map(_.toLong).toSeq)).toSeq
    val capped = Search.invertedIndexCapped(spark, sfDir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getBoolean(2),
        r.getString(3).split(",").map(_.toLong).toSeq))).toMap
    assert(capped.keySet == full.map(_._1).toSet)
    full.foreach { case (term, df, postings) =>
      val (cdf, truncated, cp) = capped(term)
      assert(cdf == df, s"$term df drifted under the cap")
      assert(truncated == (df > Search.DfCap), s"$term truncated flag")
      assert(cp == postings.take(Search.DfCap), s"$term not the sorted prefix")
      assert(cp.length <= Search.DfCap, s"$term postings over cap")
    }
    // the cap is exercised for real at this SF: at least one hot term
    assert(full.exists(_._2 > Search.DfCap), "no term exceeds the cap — raise SF or lower DfCap")
  }

  test("search_bm25: scores match a naive reference, ranks contiguous and ordered") {
    val got = Search.searchBm25(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val docs = corpus()
    val nDocs = docs.length.toLong
    val avgdl = docs.map(_._2.length.toLong).sum.toDouble / nDocs
    val dfm = Search.QueryTerms.map(t =>
      t -> docs.count(_._2.contains(t)).toLong).toMap
    val scores = docs.flatMap { case (id, toks) =>
      val dl = toks.length.toLong
      val sc = Search.QueryTerms.map { term =>
        val tf = toks.count(_ == term).toLong
        val df = dfm(term)
        if (tf == 0) BigDecimal(0)
        else {
          val idf = math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))
          BigDecimal(idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
            .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }
      }.sum
      if (sc > 0) Some(id -> sc) else None
    }
    val expected = scores.sortBy { case (id, sc) => (-sc, id) }
      .take(Search.TopK).zipWithIndex
      .map { case ((id, sc), i) =>
        (id, (sc.toDouble * 10000).round / 10000.0, i + 1) }
    assert(got.sortBy(_._3).toSeq == expected.toSeq)
  }

  test("assoc_rules: exact vs naive basket mining, thresholds honored both ways") {
    val got = Search.assocRules(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    val baskets = corpus().map { case (_, toks) => toks.distinct.toSet }
    val n = baskets.length.toLong
    val itemCnt = baskets.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val pairCnt = baskets.flatMap(b =>
      b.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = pairCnt.toSeq.flatMap { case ((a, b), nxy) =>
      Seq((a, b, nxy), (b, a, nxy))
    }.filter { case (x, _, nxy) => nxy * 20 >= n && nxy * 2 >= itemCnt(x) }
      .map { case (x, y, nxy) =>
        (x, y) -> ((nxy,
          math.round(nxy.toDouble / n * 10000) / 10000.0,
          math.round(nxy.toDouble / itemCnt(x) * 10000) / 10000.0,
          math.round((nxy * n).toDouble / (itemCnt(x) * itemCnt(y)) * 10000) / 10000.0))
      }.toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, (nxy, sup, conf, lift)) =>
      val (enxy, esup, econf, elift) = expected(k)
      assert(nxy == enxy, s"$k n_xy")
      assert(math.abs(sup - esup) < 1e-9 && math.abs(conf - econf) < 1e-9 &&
        math.abs(lift - elift) < 1e-9, s"$k ratios")
    }
  }

  test("weighted_sample: exact A-ES selection vs JVM replay, weight bias real") {
    import graft.operators.Curation
    val got = Curation.weightedSample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.length == math.min(Curation.WeightedK,
      Tables.documents(spark, sfDir).count()).toInt)
    val all = Tables.documents(spark, sfDir)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), math.max(r.getLong(1), 1L)))
    val keyed = all.map { case (id, w) =>
      val u = (java.lang.Long.parseLong(md5hex(s"ws|$id").take(4), 16)
        .toDouble + 0.5) / 65536.0
      (id, w, math.log(u) / w)
    }
    val expected = keyed.sortBy { case (id, _, k) => (-k, id) }
      .take(Curation.WeightedK).zipWithIndex
      .map { case ((id, w, _), i) => (id, w, i + 1) }
    assert(got.sortBy(_._3).toSeq == expected.toSeq)
    // the draw is genuinely weighted: sampled docs skew long
    val meanAll = all.map(_._2).sum.toDouble / all.length
    val meanSel = got.map(_._2).sum.toDouble / got.length
    assert(meanSel > meanAll, s"selected mean $meanSel vs corpus $meanAll")
  }

  test("cooccurrence_pairs: pair mass conserved, exact vs naive adjacent pairs") {
    val got = Search.cooccurrencePairs(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val naive = corpus().flatMap { case (_, toks) =>
      if (toks.length >= 2) toks.sliding(2).map(p => (p(0), p(1))).toSeq
      else Seq.empty
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got == naive)
    assert(got.values.sum ==
      corpus().map(c => math.max(0, c._2.length - 1).toLong).sum)
  }

  test("text_collocations: PMI + LLR match the naive contingency replay, exactly the >= min-count pairs") {
    val bigrams = corpus().flatMap { case (_, toks) =>
      if (toks.length >= 2) toks.sliding(2).map(p => (p(0), p(1))).toSeq
      else Seq.empty
    }
    val cnt = bigrams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nX = bigrams.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nY = bigrams.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nBig = bigrams.length.toLong
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def sx(x: Long): Double = if (x == 0) 0.0 else x.toDouble * math.log(x.toDouble)
    val expect = cnt.filter(_._2 >= Search.CollocMinCount).map { case ((w1, w2), n) =>
      val (nx, ny) = (nX(w1), nY(w2))
      val (k12, k21, k22) = (nx - n, ny - n, nBig - nx - ny + n)
      // the exact expression trees of the operator (left-assoc chains)
      val pmi = r4(math.log(n.toDouble * nBig / (nx.toDouble * ny)))
      val llr = r4(2.0 * (sx(nBig) + sx(n) + sx(k12) + sx(k21) + sx(k22) -
        sx(nx) - sx(nBig - nx) - sx(ny) - sx(nBig - ny)))
      (w1, w2) -> ((n, nx, ny, pmi, llr))
    }
    val got = Search.collocations(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    assert(got.keySet == expect.keySet, "pair coverage differs from the min-count cut")
    assert(got == expect,
      s"${got.count { case (k, v) => !expect.get(k).contains(v) }} pairs diverge")
    // the scores genuinely rank: strong collocations separate from weak
    assert(got.values.map(_._5).toSet.size > 1 && got.values.map(_._4).toSet.size > 1)
  }
}
