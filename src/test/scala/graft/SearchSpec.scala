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
    val idx = Search.invertedIndex(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2))).toSeq
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
}
