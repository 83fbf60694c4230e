package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** PageRank invariants (SURVEY §2 #32b). */
class GraphSpec extends SparkSpecBase {

  test("pagerank: mass conserved, all positive, hub side outranks leaf side") {
    val rows = Graph.pagerank(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 > 0))
    // bidirected graph, no dangling nodes ⇒ each iteration maps total
    // mass 1 → 0.15 + 0.85·1 = 1 (up to the 1e-10 output rounding)
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-6,
      s"rank mass ${rows.map(_._2).sum}")
    // suppliers (odd ids) are the rare side of the bipartite trade
    // graph — each aggregates many customers' mass, so the average
    // supplier must outrank the average customer
    val (supp, cust) = rows.partition(r => r._1 % 2 == 1)
    assert(supp.nonEmpty && cust.nonEmpty)
    assert(supp.map(_._2).sum / supp.length > cust.map(_._2).sum / cust.length)
    // every graph node is ranked: node count matches the edge endpoints
    val nNodes = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("p"))
      .agg(countDistinct(col("c")) + countDistinct(col("p"))).head().getLong(0)
    assert(rows.length.toLong == nNodes)
  }

  test("graph_hits: bit-for-bit naive alternation replay; bipartite separation") {
    val edges = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    // the DECIMAL(28,12) cast-then-exact-sum rule, replayed in BigDecimal
    def d12(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    var hub: Map[Long, Double] = nodes.map(_ -> 1.0).toMap
    var auth: Map[Long, Double] = Map.empty
    for (_ <- 1 to Graph.HitsIters) {
      val aRaw = edges.filter(e => hub.contains(e._1)).groupBy(_._2)
        .view.mapValues(es => es.map(e => d12(hub(e._1))).sum.toDouble).toMap
      val aNrm = aRaw.values.map(d12).sum.toDouble
      auth = aRaw.view.mapValues(_ / aNrm).toMap
      val hRaw = edges.filter(e => auth.contains(e._2)).groupBy(_._1)
        .view.mapValues(es => es.map(e => d12(auth(e._2))).sum.toDouble).toMap
      val hNrm = hRaw.values.map(d12).sum.toDouble
      hub = hRaw.view.mapValues(_ / hNrm).toMap
    }
    def r8(x: Double) = BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = nodes.map(n =>
      n -> ((r8(hub.getOrElse(n, 0.0)), r8(auth.getOrElse(n, 0.0))))).toMap
    val got = Graph.hits(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got == expect,
      s"${got.count { case (k, v) => !expect.get(k).contains(v) }} nodes diverge")
    // bipartite semantics: suppliers (odd) carry authority only,
    // customers (even) hub only; both L1 masses normalize to 1
    got.foreach { case (n, (h, a)) =>
      if (n % 2 == 1) assert(h == 0.0 && a > 0.0, s"supplier $n ($h, $a)")
      else assert(a == 0.0 && h > 0.0, s"customer $n ($h, $a)")
    }
    assert(math.abs(got.values.map(_._1).sum - 1.0) < 1e-5)
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-5)
    // the score space genuinely discriminates (no uniform collapse)
    assert(got.filter(_._1 % 2 == 0).values.map(_._1).toSet.size > 1)
    assert(got.filter(_._1 % 2 == 1).values.map(_._2).toSet.size > 1)
  }
}
