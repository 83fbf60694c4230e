package graft

import graft.operators.{Graph, Learn, Search, Similarity}
import org.apache.spark.sql.functions.col

/** Round-12 learned-model + graph-analytics operators (SURVEY §2
  * #69/#69b/#69c, #32c/#32d): exact-vs-naive JVM references at
  * sf0.001 plus each operator's structural invariants. */
class LearnGraphSpec extends SparkSpecBase {

  private def naiveTokens(text: String): Array[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  private def docs() = Tables.documents(spark, sfDir)
    .select("doc_id", "lang", "text").collect()
    .map(r => (r.getLong(0), r.getString(1), naiveTokens(r.getString(2))))

  test("nb_train: complete smoothed grid, counts exact vs naive, P(t|c) sums to 1") {
    val got = Learn.nbTrain(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val corpus = docs()
    val vocab = corpus.flatMap(_._3).distinct.toSet
    val classes = corpus.map(_._2).distinct.toSet
    assert(got.keySet == (for (c <- classes; t <- vocab) yield (c, t)),
      "grid is not classes × vocab")
    val tokCnt = corpus.flatMap { case (_, c, ts) => ts.map(t => (c, t)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val totCnt = corpus.flatMap { case (_, c, ts) => ts.map(_ => c) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val docCnt = corpus.map(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = corpus.length.toLong
    got.foreach { case ((c, t), (nTc, loglik, logprior)) =>
      assert(nTc == tokCnt.getOrElse((c, t), 0L), s"($c,$t) count")
      val expLik = math.log((nTc + 1.0) / (totCnt(c) + vocab.size))
      assert(math.abs(loglik - (math.round(expLik * 10000) / 10000.0)) < 1e-12,
        s"($c,$t) loglik")
      val expPri = math.log(docCnt(c).toDouble / n)
      assert(math.abs(logprior - (math.round(expPri * 10000) / 10000.0)) < 1e-12,
        s"$c logprior")
    }
    // Laplace smoothing closes the distribution: Σ_t P(t|c) = 1
    classes.foreach { c =>
      val mass = vocab.toSeq.map(t =>
        (tokCnt.getOrElse((c, t), 0L) + 1.0) / (totCnt(c) + vocab.size)).sum
      assert(math.abs(mass - 1.0) < 1e-9, s"$c mass $mass")
    }
  }

  test("feature_chi2: statistic matches the naive 2x2 replay; exact top-k per class") {
    val corpus = docs()
    val present = corpus.flatMap { case (_, c, ts) => ts.distinct.map(t => (c, t)) }
    val a = present.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nT = present.map(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nC = corpus.map(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = corpus.length.toLong
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val scored = a.map { case ((c, t), nCt) =>
      val chi2 =
        if (nT(t) == n || nC(c) == n) 0.0
        else {
          // the operator's exact expression tree: integer cells cast
          // to double, (N*det)*det / product-of-marginals
          val k11 = nCt.toDouble
          val k12 = (nC(c) - nCt).toDouble
          val k21 = (nT(t) - nCt).toDouble
          val k22 = (n - nC(c) - nT(t) + nCt).toDouble
          val det = k11 * k22 - k12 * k21
          n.toDouble * det * det /
            ((k11 + k12) * (k21 + k22) * (k11 + k21) * (k12 + k22))
        }
      (c, t) -> ((nCt, nT(t), r4(chi2)))
    }
    val expect = scored.groupBy(_._1._1).flatMap { case (c, entries) =>
      entries.toSeq
        .sortBy { case ((_, t), (_, _, x2)) => (-x2, t) }
        .take(Learn.Chi2TopK).zipWithIndex
        .map { case (((_, t), (nCt, nt, x2)), i) =>
          (c, i + 1) -> ((t, nCt, nt, x2)) }
    }
    val got = Learn.featureChi2(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got == expect,
      s"${got.count { case (k, v) => !expect.get(k).contains(v) }} rows diverge")
    // every class reports a full (or class-capped) top-k slate
    nC.keys.foreach { c =>
      val slate = got.keys.filter(_._1 == c).map(_._2).toSeq.sorted
      val expectK = math.min(Learn.Chi2TopK, scored.count(_._1._1 == c))
      assert(slate == (1 to expectK), s"$c slate $slate")
    }
    // the statistic genuinely discriminates: top-1 features dominate
    assert(got.values.map(_._4).toSet.size > 1)
  }

  test("nb_classify: argmax matches a naive JVM classifier, one row per doc") {
    val got = Learn.nbClassify(spark, sfDir).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getDouble(2)))).toMap
    val corpus = docs()
    assert(got.size == corpus.length)
    val vocab = corpus.flatMap(_._3).distinct.toSet
    val tokCnt = corpus.flatMap { case (_, c, ts) => ts.map(t => (c, t)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val totCnt = corpus.flatMap { case (_, c, ts) => ts.map(_ => c) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val docCnt = corpus.map(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val classes = docCnt.keys.toSeq.sorted
    val n = corpus.length.toLong
    corpus.foreach { case (id, _, ts) =>
      val scores = classes.map { c =>
        // per-token logliks accumulate in DECIMAL(28,12) (the
        // order-free house rule) before the double prior add + round-4
        val s = ts.map(t => BigDecimal(math.log(
          (tokCnt.getOrElse((c, t), 0L) + 1.0) / (totCnt(c) + vocab.size)))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble +
          math.log(docCnt(c).toDouble / n)
        c -> math.round(s * 10000) / 10000.0
      }
      val (bestC, bestS) = scores.minBy { case (c, s) => (-s, c) }
      val (gc, gs) = got(id)
      assert(gc == bestC && math.abs(gs - bestS) < 1e-12, s"doc $id: got ($gc,$gs) want ($bestC,$bestS)")
    }
  }

  test("matmul_gram: upper triangle exact vs a naive decimal-summed reference") {
    val got = Learn.matmulGram(spark, sfDir).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    val d = Similarity.EmbDim
    assert(got.size == d * (d + 1) / 2)
    val vecs = Tables.embeddings(spark, sfDir).select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    for (i <- 1 to d; j <- i to d) {
      val exp = vecs.map(v => BigDecimal(v(i - 1).toDouble * v(j - 1).toDouble)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum
      val expR = (exp.toDouble * 10000).round / 10000.0
      assert(math.abs(got((i, j)) - expR) < 1e-12, s"gram($i,$j)")
    }
  }

  test("pca_power: exact vs a naive JVM power-iteration replay; unit loadings") {
    val got = Learn.pcaPower(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    val d = Similarity.EmbDim
    assert(got.length == d)
    val eigval = got.head._3
    assert(got.forall(_._3 == eigval))
    // ‖v‖ = 1 up to the round-8 output quantization
    val norm2 = got.map(t => t._2 * t._2).sum
    assert(math.abs(norm2 - 1.0) < 1e-6, s"loading norm² $norm2")
    // exact replay: gram via decimal sums, 5 iterations, same casts
    val vecs = Tables.embeddings(spark, sfDir).select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    def dec(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val g = Array.tabulate(d, d) { (i, j) =>
      vecs.map(v => dec(v(i).toDouble * v(j).toDouble)).sum.toDouble
    }
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var nrm = 0.0
    for (_ <- 1 to Learn.PowerIters) {
      val w = Array.tabulate(d) { i =>
        (0 until d).map(j => dec(g(i)(j) * v(j))).sum.toDouble
      }
      nrm = math.sqrt(w.map(x => dec(x * x)).sum.toDouble)
      v = w.map(_ / nrm)
    }
    got.foreach { case (i, loading, ev) =>
      val expL = (BigDecimal(v(i - 1)).setScale(8, BigDecimal.RoundingMode.HALF_UP)).toDouble
      assert(math.abs(loading - expL) < 1e-12, s"dim $i loading $loading vs $expL")
      val expE = (BigDecimal(nrm).setScale(6, BigDecimal.RoundingMode.HALF_UP)).toDouble
      assert(math.abs(ev - expE) < 1e-12, s"eigval $ev vs $expE")
    }
  }

  test("knn_classify: majority vote over naive brute-force neighbors") {
    val got = Learn.knnClassify(spark, sfDir).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2)))).toMap
    assert(got.size == Learn.KnnQueries)
    val all = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    all.filter(_._1 < Learn.KnnQueries).foreach { case (q, qe, _) =>
      val nbrs = all.filter(_._1 != q)
        .map { case (c, ce, lb) => (c, lb, cos(qe, ce)) }
        .sortBy { case (c, _, s) => (-s, c) }.take(Learn.KnnK)
      val (predLabel, votes) = nbrs.groupBy(_._2).view.mapValues(_.length.toLong)
        .toSeq.minBy { case (lb, n) => (-n, lb) }
      assert(got(q) == ((predLabel, votes)), s"query $q: got ${got(q)} want ($predLabel,$votes)")
    }
  }

  test("itemsim_cf: top-N neighbors match a naive co-rating reference; cap honored") {
    val got = Learn.itemSimilarity(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), (r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val ui = li.flatMap { case (ok, sk) => ord.get(ok).map(c => (c, sk)) }.distinct
    val kept = ui.groupBy(_._1).filter(_._2.length <= Learn.HotUserMax)
      .values.flatten.toSeq
    val ni = kept.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val co = kept.groupBy(_._1).values.flatMap { items =>
      val is = items.map(_._2).sorted
      for (i <- is.indices; j <- (i + 1) until is.length) yield (is(i), is(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val directed = co.toSeq.flatMap { case ((a, b), n) => Seq((a, b, n), (b, a, n)) }
    val expected = directed.groupBy(_._1).flatMap { case (item, ns) =>
      ns.map { case (_, nb, n) =>
        val sim = BigDecimal(n.toDouble / math.sqrt((ni(item) * ni(nb)).toDouble))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (nb, n, sim)
      }.sortBy { case (nb, _, sim) => (-sim, nb) }
        .take(Learn.ItemSimTopN).zipWithIndex
        .map { case ((nb, n, sim), k) => (item, k + 1) -> ((nb, n, sim)) }
    }
    assert(got.keySet == expected.keySet)
    expected.foreach { case (k, v) => assert(got(k) == v, s"$k: got ${got(k)} want $v") }
  }

  test("graph_sssp: distances equal a naive BFS; source is the min node") {
    val out = Graph.sssp(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val g = Graph.tradeGraphDir(spark, sfDir)
    val edges = spark.read.parquet(s"$g/edges")
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val source = edges.map(_._1).min
    var dist = Map(source -> 0L)
    var frontier = Seq(source)
    var level = 0L
    while (frontier.nonEmpty && level < Graph.SsspIters) {
      level += 1
      val next = frontier.flatMap(adj.getOrElse(_, Seq.empty))
        .distinct.filterNot(dist.contains)
      next.foreach(nd => dist += nd -> level)
      frontier = next
    }
    assert(out == dist, s"sssp mismatch: got ${out.size} rows, want ${dist.size}")
    assert(out(source) == 0L)
    assert(out.values.max >= 2, "degenerate graph: BFS never left the source's neighborhood")
  }

  test("graph_triangles: counts equal a naive enumeration over the undirected edge set") {
    val row = Graph.triangleCount(spark, sfDir).collect()(0)
    val (gn, ge, gt) = (row.getLong(0), row.getLong(1), row.getLong(2))
    val und = Search.cooccurrencePairs(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => if (a < b) (a, b) else (b, a) }
      .distinct
    val nodes = und.flatMap { case (a, b) => Seq(a, b) }.distinct
    val edgeSet = und.toSet
    val naiveTris = nodes.sorted.combinations(3).count { t =>
      edgeSet((t(0), t(1))) && edgeSet((t(0), t(2))) && edgeSet((t(1), t(2)))
    }
    assert(gn == nodes.length.toLong, "n_nodes")
    assert(ge == und.length.toLong, "n_edges")
    assert(gt == naiveTris.toLong, s"n_triangles got $gt want $naiveTris")
    assert(gt > 0, "degenerate graph: no triangles at this SF")
  }

  test("logreg_train: weights equal a naive JVM gradient-descent replay bit-for-bit") {
    import graft.functions.TextFunctions
    val markers = TextFunctions.langMarkers
    val langs = markers.map(_._1)
    def occurrences(text: String, m: String): Int = {
      val padded = " " + text.toLowerCase + " "
      val needle = s" $m "
      var c = 0; var i = padded.indexOf(needle)
      while (i >= 0) { c += 1; i = padded.indexOf(needle, i + needle.length) }
      c
    }
    val rows = Tables.documents(spark, sfDir).select("lang", "text").collect()
      .map { r =>
        val y = if (r.getString(0) == "en") 1.0 else 0.0
        y -> markers.map { case (_, ms) =>
          ms.map(occurrences(r.getString(1), _)).sum.toDouble }.toArray
      }
    def r10(x: Double) = BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    def dec12(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val d = langs.length
    var w = Array.fill(d + 1)(0.0) // w(0) = intercept
    for (_ <- 1 to Learn.LogregIters) {
      val gs = Array.fill(d + 1)(BigDecimal(0))
      rows.foreach { case (y, x) =>
        var z = w(0)
        for (j <- 0 until d) z += w(j + 1) * x(j) // same left-assoc chain
        val resid = r10(1.0 / (1.0 + math.exp(-z))) - y
        gs(0) += dec12(resid)
        for (j <- 0 until d) gs(j + 1) += dec12(x(j) * resid)
      }
      w = w.indices.map(j =>
        w(j) - Learn.LogregEta * (gs(j).toDouble / rows.length)).toArray
    }
    def r8(x: Double) = BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = (("intercept" -> r8(w(0))) +:
      langs.zipWithIndex.map { case (l, j) => l -> r8(w(j + 1)) }).toMap
    val got = Learn.logregTrain(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == expect, s"got $got\nexp $expect")
    // the descent actually descended: at least one weight moved
    assert(got.values.exists(_ != 0.0))

    // apply face: counts reconcile against the same replayed weights
    val preds = rows.map { case (y, x) =>
      var z = w(0)
      for (j <- 0 until d) z += w(j + 1) * x(j)
      (y, z >= 0.0)
    }
    val c = Learn.logregClassify(spark, sfDir).collect()(0)
    assert(c.getLong(0) == rows.length.toLong)
    assert(c.getLong(1) == preds.count(_._2).toLong)
    assert(c.getLong(2) == preds.count(_._1 == 1.0).toLong)
    assert(c.getLong(3) == preds.count(p => p._2 == (p._1 == 1.0)).toLong)
    assert(c.getDouble(4) == BigDecimal(c.getLong(3).toDouble / rows.length)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)

    // calibration face: deciles of the rounded sigma, buckets
    // reconcile (Σn = corpus, Σn_pos = positives), mean_pred in-bucket
    val sigs = rows.map { case (y, x) =>
      var z = w(0)
      for (j <- 0 until d) z += w(j + 1) * x(j)
      (y, r10(1.0 / (1.0 + math.exp(-z))))
    }
    val naiveB = sigs.groupBy { case (_, sg) => math.min((sg * 10).toInt, 9) }
    val cal = Learn.logregCalibration(spark, sfDir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(cal.keySet == naiveB.keySet)
    assert(cal.values.map(_._1).sum == rows.length.toLong)
    assert(cal.values.map(_._2).sum == rows.count(_._1 == 1.0).toLong)
    cal.foreach { case (b, (n, nPos, meanPred, fracPos)) =>
      val members = naiveB(b)
      assert(n == members.length.toLong && nPos == members.count(_._1 == 1.0).toLong)
      val mp = members.map(m => BigDecimal(m._2).setScale(12, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble / members.length
      assert(meanPred == BigDecimal(mp).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(fracPos == BigDecimal(members.count(_._1 == 1.0).toDouble / members.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(meanPred >= b / 10.0 - 1e-9 && meanPred <= (b + 1) / 10.0 + 1e-9 || b == 9)
    }
  }

  test("eval_cv: per-fold accuracy equals a naive JVM leave-fold-out NB replay") {
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = Tables.documents(spark, sfDir).select("doc_id", "lang", "text").collect()
      .map { r =>
        val fold = (Integer.parseInt(md5hex(s"cv|${r.getLong(0)}").substring(0, 4), 16)
          % Learn.CvFolds)
        (r.getLong(0), r.getString(1), fold, naiveTokens(r.getString(2)).toSeq)
      }
    val langs = docs.map(_._2).distinct.sorted
    val all = docs.flatMap(d => d._4.map(t => (d._2, d._3, t)))
    val ctG = all.groupBy(x => (x._1, x._3)).view.mapValues(_.length.toLong).toMap
    val ctF = all.groupBy(x => (x._2, x._1, x._3)).view.mapValues(_.length.toLong).toMap
    val totG = all.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val totF = all.groupBy(x => (x._2, x._1)).view.mapValues(_.length.toLong).toMap
    val termG = all.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val termF = all.groupBy(x => (x._2, x._3)).view.mapValues(_.length.toLong).toMap
    val vF = (0 until Learn.CvFolds).map(f =>
      f -> termG.count { case (t, n) => n - termF.getOrElse((f, t), 0L) > 0 }).toMap
    val ndG = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val ndF = docs.groupBy(d => (d._3, d._2)).view.mapValues(_.length.toLong).toMap
    val nAll = docs.length.toLong
    val nF = docs.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val expect = docs.filter(_._4.nonEmpty).groupBy(_._3).map { case (f, ds) =>
      val correct = ds.count { case (_, trueLang, _, toksD) =>
        val scores = langs.map { c =>
          // DECIMAL(28,12) loglik accumulation — the order-free rule
          var sll = BigDecimal(0)
          toksD.foreach { t =>
            val nOof = ctG.getOrElse((c, t), 0L) - ctF.getOrElse((f, c, t), 0L)
            sll += BigDecimal(math.log((nOof + 1.0) /
              ((totG(c) - totF.getOrElse((f, c), 0L)) + vF(f))))
              .setScale(12, BigDecimal.RoundingMode.HALF_UP)
          }
          val prior = math.log((ndG(c) - ndF.getOrElse((f, c), 0L)).toDouble /
            (nAll - nF(f)))
          c -> r4(sll.toDouble + prior)
        }
        scores.maxBy { case (c, sc) => (sc, langOrd(c)) }._1 == trueLang
      }
      f -> ((ds.length.toLong, correct.toLong,
        r4(correct.toDouble / ds.length)))
    }
    val got = Learn.evalCvNb(spark, sfDir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == expect, s"got $got\nexp $expect")
    assert(got.size == Learn.CvFolds && got.values.map(_._1).sum == docs.length)
  }

  /** Tie order for the argmax: score desc, lang ASC — maxBy picks the
    * max tuple, so invert the lang ordering. */
  private def langOrd(c: String): String =
    c.map(ch => (255 - ch).toChar)

  test("graph_components: labels equal naive union-find and reach the true fixpoint") {
    val got = Graph.connectedComponents(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Naive union-find over the same trade edges.
    val edges = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("p"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val naive = parent.keys.map(n => n -> find(n)).toMap
    // union-find roots are component minima because unions always
    // point the larger root at the smaller
    assert(got == naive,
      s"${got.count { case (k, v) => !naive.get(k).contains(v) }} labels diverge")
    assert(got.nonEmpty && got.exists { case (n, c) => n != c },
      "degenerate: no node was relabeled at this SF")
  }

  test("graph_clustering: per-node coefficients equal the naive neighborhood census") {
    val und = Search.cooccurrencePairs(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => if (a < b) (a, b) else (b, a) }
      .distinct
    val edgeSet = und.toSet
    val nbrs = und.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = Graph.clusteringCoeff(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // spine = every node of degree >= 2, each exactly once
    assert(got.keySet == nbrs.filter(_._2.size >= 2).keySet)
    // per-triangle global count must reconcile: Σ T(v) = 3 * n_triangles
    val nTris = Graph.triangleCount(spark, sfDir).collect()(0).getLong(2)
    assert(got.values.map(_._2).sum == 3 * nTris)
    got.foreach { case (v, (deg, nTri, lcc)) =>
      val n = nbrs(v)
      assert(deg == n.size.toLong)
      val naive = n.toSeq.sorted.combinations(2).count { p =>
        edgeSet(if (p(0) < p(1)) (p(0), p(1)) else (p(1), p(0)))
      }
      assert(nTri == naive.toLong, s"node $v: $nTri triangles, naive $naive")
      assert(lcc == BigDecimal(2.0 * naive / (deg * (deg - 1)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // the coefficient must spread: some closed, some open neighborhoods
    assert(got.values.exists(_._3 > 0) && got.values.exists(_._3 < 1))
  }

  test("matmul_gram: per-partition fold equals the declarative explode path bit-for-bit") {
    operators.Dedup.clearCaches()
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    val fold = toMap(Learn.gramCore(spark, sfDir))
    val expl = toMap(Learn.gramCoreExplode(spark, sfDir))
    assert(fold.size == Similarity.EmbDim * (Similarity.EmbDim + 1) / 2)
    assert(fold == expl,
      s"fold ≠ explode at ${fold.find(kv => expl(kv._1) != kv._2)}")
  }

  test("nb faces never broadcast a term-keyed (vocab-derived) relation; top-V tier does") {
    // Hints are the only broadcast source once AQE + auto-broadcast
    // are off, so this witnesses exactly the 100 TB contract: no
    // broadcast() hint sits on a relation whose size scales with the
    // corpus vocabulary. The bounded broadcasts (class counts,
    // priors, fold totals, scalar counts) never carry a `term`
    // output column; the top-V grid does — and is V-bounded by
    // configuration, which is the point of that tier.
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    val keys = Seq("spark.sql.adaptive.enabled", "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def termBroadcasts(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] =
        df.queryExecution.executedPlan.collect {
          case b: BroadcastExchangeExec => b.child.output.map(_.name).toSeq
        }.filter(_.contains("term"))
      assert(termBroadcasts(Learn.nbClassify(spark, sfDir)).isEmpty,
        "nb_classify broadcasts a vocab-derived relation")
      assert(termBroadcasts(Learn.evalCvNb(spark, sfDir)).isEmpty,
        "eval_cv broadcasts a vocab-derived relation")
      assert(termBroadcasts(Learn.nbClassifyTopV(spark, sfDir)).nonEmpty,
        "nb_classify_topv should broadcast its V-bounded grid")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("chi2/collocations/hits never broadcast a corpus-derived relation") {
    // Same witness as the nb faces: hints are the only broadcast
    // source with AQE + auto-broadcast off, and no hint may sit on a
    // relation that scales with the corpus (vocab-keyed marginals,
    // df counts, node/edge relations). The surviving broadcasts are
    // label-bounded or 1-row (class sizes, N, L1 norms, horizon).
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    val keys = Seq("spark.sql.adaptive.enabled", "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def broadcastCols(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] =
        df.queryExecution.executedPlan.collect {
          case b: BroadcastExchangeExec => b.child.output.map(_.name).toSeq
        }
      val banned = Set("term", "w1", "w2", "node", "src", "dst")
      def offending(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] =
        broadcastCols(df).filter(_.exists(banned))
      assert(offending(Learn.featureChi2(spark, sfDir)).isEmpty,
        "feature_chi2 broadcasts a vocab-derived relation")
      assert(offending(Search.collocations(spark, sfDir)).isEmpty,
        "text_collocations broadcasts a vocab-derived relation")
      // hits materializes each half-step via persist() + a driver
      // collect of its L1 norm (one scalar per half-step), so the
      // final plan shows only the nodes ⟕ hub ⟕ auth settle joins —
      // the node-sized relations that must NOT broadcast; the
      // interior half-steps run under the same no-hint discipline
      operators.Dedup.clearCaches()
      assert(offending(Graph.hits(spark, sfDir)).isEmpty,
        "graph_hits broadcasts a node- or edge-sized relation in its settle joins")
      // and each face's bounded broadcasts are genuinely present
      assert(broadcastCols(Learn.featureChi2(spark, sfDir)).nonEmpty)
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("nb_classify_topv: naive capped-vocab replay; OOV tokens drop") {
    val corpus = docs()
    val termCnt = corpus.flatMap(_._3).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val topv = termCnt.toSeq.sortBy { case (t, n) => (-n, t) }
      .take(Learn.NbTopV).map(_._1).toSet
    val v = topv.size
    val kept = corpus.flatMap { case (_, c, ts) =>
      ts.filter(topv.contains).map(t => (c, t)) }
    val tokCnt = kept.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val totCnt = kept.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val docCnt = corpus.map(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = corpus.length.toLong
    val classes = totCnt.keys.toSeq.sorted
    val expect = corpus.flatMap { case (id, _, ts) =>
      val inVocab = ts.filter(topv.contains)
      if (inVocab.isEmpty) None
      else {
        val scores = classes.map { c =>
          val s = inVocab.map(t => BigDecimal(math.log(
            (tokCnt.getOrElse((c, t), 0L) + 1.0) / (totCnt(c) + v)))
            .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble +
            math.log(docCnt(c).toDouble / n)
          c -> (math.round(s * 10000) / 10000.0)
        }
        Some(id -> scores.minBy { case (c, sc) => (-sc, c) })
      }
    }.toMap
    val got = Learn.nbClassifyTopV(spark, sfDir).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getDouble(2)))).toMap
    assert(got.keySet == expect.keySet,
      s"doc coverage: ${got.keySet.size} vs ${expect.keySet.size}")
    got.foreach { case (id, (gc, gs)) =>
      val (ec, es) = expect(id)
      assert(gc == ec && math.abs(gs - es) < 1e-12,
        s"doc $id: got ($gc,$gs) want ($ec,$es)")
    }
  }

  test("als_rank1: factors equal a naive JVM alternating replay bit-for-bit") {
    def dec12(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def dec2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // fully naive rating construction: JVM-side join + exact 2-dec sums
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_quantity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val custOf = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ratings = li.map { case (ok, item, q) => ((custOf(ok), item), dec2(q)) }
      .groupBy(_._1).map { case ((c, i), qs) =>
        (c, i, qs.map(_._2).sum.toDouble) }.toSeq
    var u = ratings.map(_._1).distinct.map(_ -> 1.0).toMap
    var v = Map.empty[Long, Double]
    for (_ <- 1 to Learn.AlsIters) {
      v = ratings.groupBy(_._2).map { case (i, rs) =>
        val num = rs.map(t => dec12(t._3 * u(t._1))).sum.toDouble
        val den = Learn.AlsLambda +
          rs.map(t => dec12(u(t._1) * u(t._1))).sum.toDouble
        i -> num / den
      }
      u = ratings.groupBy(_._1).map { case (c, rs) =>
        val num = rs.map(t => dec12(t._3 * v(t._2))).sum.toDouble
        val den = Learn.AlsLambda +
          rs.map(t => dec12(v(t._2) * v(t._2))).sum.toDouble
        c -> num / den
      }
    }
    val expect = v.map { case (i, x) => i -> r6(x) }
    val got = Learn.alsRank1(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == expect,
      s"als mismatch at ${got.find(kv => expect.get(kv._1) != Some(kv._2))}")
    // implicit-feedback quantities are positive, so factors must be too
    assert(got.nonEmpty && got.values.forall(_ > 0.0))
  }

  test("als_rank1 plan: ratings never re-shuffle in the loop; every required exchange is factor-sized") {
    // The round-13 review asked whether each half-step's agg output
    // re-shuffles into the next half-step's join against the
    // co-partitioned ratings. It does not, and this pins that: under
    // AQE-off + no-broadcast (the SMJ path a 100 TB run would take),
    // the ONLY exchanges allowed to carry the pairs-sized
    // (cust, item, r) relation are the two REPARTITION_BY_COL persist
    // builds — inside the loop the ratings sit pre-shuffled and only
    // factor-sized agg exchanges remain. Each half-step's groupBy key
    // IS the next join's key, so its final-agg partitioning feeds the
    // join with zero additional exchange (≤ one factor exchange per
    // half-round; the final u of the last iteration is dead code
    // Catalyst prunes).
    val keys = Seq("spark.sql.adaptive.enabled", "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      operators.Dedup.clearCaches()
      val plan = explainString(Learn.alsRank1(spark, sfDir))
      val lines = plan.linesIterator.toVector
      val starts = lines.zipWithIndex.collect {
        case (l, i) if "^\\(\\d+\\) Exchange\\b".r.findFirstIn(l.trim).isDefined => i
      }
      assert(starts.nonEmpty, plan.take(2000))
      var required = 0
      starts.foreach { i =>
        val block = lines.drop(i + 1).takeWhile(l => "^\\(\\d+\\) ".r.findFirstIn(l.trim).isEmpty)
        val inputs = block.filter(_.trim.startsWith("Input")).mkString(" ")
        val ratingsShaped = inputs.contains("cust#") && inputs.contains("item#") &&
          inputs.contains("r#")
        if (block.exists(_.contains("ENSURE_REQUIREMENTS"))) {
          required += 1
          assert(!ratingsShaped,
            s"pairs-sized ratings re-shuffle inside the loop at plan line $i:\n$inputs")
        }
      }
      assert(required > 0 && required <= 2 * Learn.AlsIters,
        s"expected at most ${2 * Learn.AlsIters} factor-sized exchanges, found $required")
    } finally {
      saved.foreach { case (k, x) => spark.conf.set(k, x) }
      operators.Dedup.clearCaches()
    }
  }

  test("als half-rounds never broadcast an entity-keyed relation") {
    // Hints are the only broadcast source once AQE + auto-broadcast
    // are off (the nb_classify guard): u and v are entity-sized —
    // corpus-UNBOUNDED — so a broadcast() hint on either side would
    // be the 100 TB scale-killer the vocab-grid fix removed. AQE is
    // still free to broadcast small sides at runtime, which is the
    // correct adaptive behavior; this pins only the STATIC plan.
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    import spark.implicits._
    val keys = Seq("spark.sql.adaptive.enabled", "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val r = Seq((1L, 10L, 5.0), (2L, 10L, 3.0)).toDF("cust", "item", "r")
      val u = Seq((1L, 1.0), (2L, 1.0)).toDF("cust", "u")
      val v = Seq((10L, 2.0)).toDF("item", "v")
      def bcasts(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.executedPlan.collect {
          case b: BroadcastExchangeExec => b.child.output.map(_.name).toSeq }
      assert(bcasts(Learn.alsStepV(r, u)).isEmpty,
        "item half-step broadcasts an entity relation")
      assert(bcasts(Learn.alsStepU(r, v)).isEmpty,
        "customer half-step broadcasts an entity relation")
    } finally saved.foreach { case (k, x) => spark.conf.set(k, x) }
  }

  test("graph_kcore: members equal naive peeling to the true fixpoint") {
    // naive peeling with UNBOUNDED rounds — also witnesses that the
    // operator's KcoreIters budget suffices at this SF
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val custOf = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = li.map { case (ok, sk) => (custOf(ok) * 2, sk * 2 + 1) }.distinct
    var edges = (pairs ++ pairs.map(p => (p._2, p._1))).toSet
    var changed = true
    while (changed) {
      val deg = edges.groupBy(_._1).map { case (n, es) => n -> es.size }
      val keep = deg.filter(_._2 >= Graph.KcoreK).keySet
      val next = edges.filter(e => keep(e._1) && keep(e._2))
      changed = next.size != edges.size
      edges = next
    }
    val expect = edges.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    val got = Graph.kcore(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect, s"kcore: ${got.size} nodes vs naive ${expect.size}")
    // the defining property: minimum within-core degree >= k, and the
    // core is non-trivial at this SF (peeling actually removed nodes)
    assert(got.nonEmpty, "degenerate: the whole graph peeled away at this SF")
    assert(got.values.min >= Graph.KcoreK.toLong)
    val allNodes = (pairs.map(_._1) ++ pairs.map(_._2)).distinct.size
    assert(got.size < allNodes, "degenerate: nothing peeled at this SF")
  }
}
