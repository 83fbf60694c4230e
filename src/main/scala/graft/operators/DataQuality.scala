package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** #11c Declarative data-quality constraint suite — the validation
  * pass every production pipeline runs between ingest and publish
  * (the Deequ/expectations idea, built Spark-first). A constraint
  * list COMPILES INTO ONE AGGREGATION over the fact table: each
  * constraint contributes a violation-count aggregate, so N
  * constraints cost one scan + one partial-agg shuffle round — never
  * one pass per constraint (at 100 TB the scan IS the budget; Deequ's
  * central design point is the same analyzer fusion). The lone
  * constraint a single pass cannot express — referential integrity
  * against a dimension — runs as a LEFT ANTI join (broadcast-able dim
  * keys), the relational form of a membership check.
  *
  * The suite deliberately includes a constraint that FAILS on this
  * corpus (`unique(o_custkey)` — customers place many orders) so both
  * verdict branches are exercised and hash-checked; a DQ harness that
  * can only say "pass" proves nothing.
  *
  * Reference analogue: the counter-based validation jobs built on
  * `mapreduce/Counters` (hadoop-mapreduce-client-core
  * `org.apache.hadoop.mapreduce.Counters`) — violation tallies
  * accumulated map-side in one pass, verdicts read off the totals.
  */
object DataQuality {

  /** A named constraint whose violation count folds into the single
    * aggregation pass. */
  private final case class Check(name: String, violations: Column)

  def dqCheck(s: SparkSession, dir: String): DataFrame =
    dqReport(Tables.orders(s, dir), Tables.customer(s, dir))

  /** Operator core over any (orders-shaped fact, customer-shaped dim)
    * pair — what the planted-violation spec exercises directly. */
  private[graft] def dqReport(orders: DataFrame, customer: DataFrame): DataFrame = {
    val checks = Seq(
      Check("not_null(o_custkey)",
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L))),
      Check("unique(o_orderkey)",
        count(lit(1)) - count_distinct(col("o_orderkey"))),
      Check("unique(o_custkey)", // expected to FAIL: repeat buyers
        count(lit(1)) - count_distinct(col("o_custkey"))),
      Check("range(o_totalprice>0)",
        sum(when(col("o_totalprice") > 0, 0L).otherwise(1L))),
      Check("in_set(o_orderstatus)",
        sum(when(col("o_orderstatus").isin("O", "F", "P"), 0L).otherwise(1L))))
    // All five analyzers fuse into ONE agg (count_distinct plans the
    // expand+two-round shape; the plain counters ride along partial).
    val wide = orders.agg(
      checks.head.violations.as("c0"),
      checks.tail.zipWithIndex.map { case (c, i) => c.violations.as(s"c${i + 1}") }: _*)
    val stacked = wide.selectExpr(
      s"stack(${checks.size}, " +
        checks.zipWithIndex.map { case (c, i) => s"'${c.name}', c$i" }.mkString(", ") +
        ") AS (constraint_name, violations)")
    // Referential integrity: every o_custkey resolves in customer.
    // LEFT ANTI keyed on the dim — the optimizer broadcasts the key
    // column when the dim is small; at scale it's one hash join, and
    // the fact table's other columns are pruned before the exchange.
    val orphans = orders.select(col("o_custkey"))
      .join(customer.select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("v"))
      .select(lit("ref(o_custkey->customer)").as("constraint_name"),
        col("v").as("violations"))
    stacked.unionAll(orphans)
      .withColumn("passed", col("violations") === 0L)
  }
}
