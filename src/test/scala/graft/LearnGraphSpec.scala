package graft

import graft.operators.{Graph, Learn, Search, Similarity}

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
        val s = ts.map(t => math.log(
          (tokCnt.getOrElse((c, t), 0L) + 1.0) / (totCnt(c) + vocab.size))).sum +
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
}
