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
}
