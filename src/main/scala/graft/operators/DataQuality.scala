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

  /** Fixed-width value bucket for [[dqDrift]] — configuration-bounded
    * bucket space (0–500-ish values → ~25 buckets). */
  val PsiBucketW = 20.0

  /** The industry PSI verdict thresholds (compared on the ROUNDED
    * statistic, so the boundary is bit-equal cross-engine). */
  val PsiModerate = 0.1
  val PsiMajor = 0.25

  /** #11d Distribution-drift monitor — POPULATION STABILITY INDEX per
    * event type between the corpus's first and second time halves
    * (the standard "did this feature's distribution move" check an ML
    * serving/monitoring pipeline runs next to the constraint suite;
    * PSI is the credit-scoring industry's drift metric and the
    * numeric-feature sibling of the token-level corpus divergence
    * #55b). Values bucket by FIXED width ([[PsiBucketW]] — the bucket
    * space is configuration-bounded, and fixed edges sidestep the
    * quantile-cut tie seams); the time split is the integer-ms
    * midpoint written multiplication-form (ms·2 ≤ lo+hi — no
    * division rounding to reason about). Each type's PSI =
    * Σ_buckets (p−q)·ln(p/q) over add-1-smoothed shares (the #55b
    * smoothing, so a bucket empty on one side contributes a finite
    * term), with verdict stable/moderate/major at the
    * [[PsiModerate]]/[[PsiMajor]] cuts.
    *
    * Execution: ONE corpus pass to (type, bucket, period) counts with
    * map-side partials — output |types|·|buckets|-bounded; per-type
    * totals join back label-bounded-broadcast; the PSI terms are
    * per-row fixed double trees over exact integer counts (FP never
    * aggregates raw — the ln terms accumulate in DECIMAL(28,12),
    * round 6, the #55b contract). The 1-row time bounds broadcast. */
  def dqDrift(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_type"), col("value"), col("ts"))
    val bounds = ev.agg(min(unix_millis(col("ts"))).as("lo"),
      max(unix_millis(col("ts"))).as("hi"))
    val bucketed = ev.crossJoin(broadcast(bounds))
      .select(col("event_type"),
        floor(col("value") / lit(PsiBucketW)).as("bucket"),
        (unix_millis(col("ts")) * 2 <= col("lo") + col("hi")).as("base"))
    val counts = bucketed.groupBy(col("event_type"), col("bucket"))
      .agg(sum(when(col("base"), 1L).otherwise(0L)).as("c_base"),
        sum(when(col("base"), 0L).otherwise(1L)).as("c_cur"))
    val totals = counts.groupBy(col("event_type"))
      .agg(sum(col("c_base")).as("t_base"), sum(col("c_cur")).as("t_cur"),
        count(lit(1)).as("n_buckets"))
    val p = (col("c_base") + lit(1L)).cast("double") /
      (col("t_base") + col("n_buckets")).cast("double")
    val q = (col("c_cur") + lit(1L)).cast("double") /
      (col("t_cur") + col("n_buckets")).cast("double")
    val psi = counts.join(broadcast(totals), "event_type")
      .select(col("event_type"), col("n_buckets"), col("t_base"), col("t_cur"),
        ((p - q) * log(p / q)).cast("decimal(28,12)").as("term"))
      .groupBy(col("event_type"))
      .agg(max(col("n_buckets")).as("n_buckets"),
        max(col("t_base")).as("n_base"), max(col("t_cur")).as("n_cur"),
        round(sum(col("term")).cast("double"), 6).as("psi"))
    psi.select(col("event_type"), col("n_buckets"), col("n_base"), col("n_cur"),
      col("psi"),
      when(col("psi") > PsiMajor, lit("major"))
        .when(col("psi") > PsiModerate, lit("moderate"))
        .otherwise(lit("stable")).as("verdict"))
  }

  /** DuckDB mirror of [[dqDrift]] — identical bucket/midpoint/smoothing
    * expression trees, DECIMAL(28,12) term accumulation. */
  def dqDriftOracleSql: String = {
    val p = "CAST(c.c_base + 1 AS DOUBLE) / CAST(t.t_base + t.n_buckets AS DOUBLE)"
    val q = "CAST(c.c_cur + 1 AS DOUBLE) / CAST(t.t_cur + t.n_buckets AS DOUBLE)"
    s"""WITH b AS (SELECT min(epoch_ms(ts)) AS lo, max(epoch_ms(ts)) AS hi
       |  FROM events),
       |e AS (SELECT event_type,
       |  CAST(floor(value / $PsiBucketW) AS BIGINT) AS bucket,
       |  epoch_ms(ts) * 2 <= b.lo + b.hi AS base FROM events, b),
       |c AS (SELECT event_type, bucket,
       |  CAST(sum(CASE WHEN base THEN 1 ELSE 0 END) AS BIGINT) AS c_base,
       |  CAST(sum(CASE WHEN base THEN 0 ELSE 1 END) AS BIGINT) AS c_cur
       |  FROM e GROUP BY 1, 2),
       |t AS (SELECT event_type, CAST(sum(c_base) AS BIGINT) AS t_base,
       |  CAST(sum(c_cur) AS BIGINT) AS t_cur, count(*) AS n_buckets
       |  FROM c GROUP BY 1),
       |s AS (SELECT c.event_type, t.n_buckets, t.t_base, t.t_cur,
       |  CAST(($p - $q) * ln($p / $q) AS DECIMAL(28,12)) AS term
       |  FROM c JOIN t USING (event_type)),
       |r AS (SELECT event_type, max(n_buckets) AS n_buckets,
       |  max(t_base) AS n_base, max(t_cur) AS n_cur,
       |  round(CAST(sum(term) AS DOUBLE), 6) AS psi
       |  FROM s GROUP BY 1)
       |SELECT event_type, n_buckets, n_base, n_cur, psi,
       |  CASE WHEN psi > $PsiMajor THEN 'major'
       |    WHEN psi > $PsiModerate THEN 'moderate'
       |    ELSE 'stable' END AS verdict
       |FROM r""".stripMargin
  }

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
