package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-stage analytics (SURVEY §2.3): what took a chain of
  * MapReduce jobs in the reference is one Catalyst plan here —
  * TPC-H-class pipelines, windowed/ranked analytics, rollups,
  * semi-structured extraction, event-time aggregation and batch
  * sessionization.
  *
  * Scale notes: Q3/Q5-class plans broadcast every dimension
  * (region/nation/customer-filter) so only the lineitem↔orders join
  * shuffles; window queries partition by their analysis key so state
  * per task is one group's rows; sessionization is the classic
  * gap-and-island formulation (two window passes, one shuffle on
  * user_id — no per-user driver logic, arbitrarily many users).
  */
object Analytics {

  /** One ANSI SQL string that runs verbatim on both Spark SQL and
    * DuckDB — the SQL front-end surface ("queries expressed in SQL"). */
  val SqlFrontendQuery: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
      | round(sum(l_quantity), 2) AS sum_qty,
      | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_quantity > 5
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** SQL front-end: tables registered as temp views, query text goes
    * through Spark's SQL parser — identical text is the oracle. */
  def sqlFrontend(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.names.foreach { n =>
      graft.Tables.load(s, dir, n).createOrReplaceTempView(n)
    }
    s.sql(SqlFrontendQuery)
  }

  /** TPC-H Q1: pricing summary (partial-agg heavy, scan-bound). */
  def tpchQ1(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,4)")).cast("double").as("sum_disc_price"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).cast("decimal(18,6)")).cast("double").as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q3-class: revenue of unshipped orders for one segment. */
  def tpchQ3(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,4)")).cast("double").as("revenue"))
  }

  /** TPC-H Q5-class: revenue by nation — every dim broadcast, one
    * fact-fact shuffle. */
  def tpchQ5(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, dir)),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,4)")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))

  /** TPC-H Q4-class: order-priority checking — a fact-to-fact EXISTS
    * (orders with at least one line shipped after the order date in
    * one quarter). The semi-join is the plan shape Q4 exists to test:
    * Spark plans a left-semi hash join keyed on l_orderkey, so
    * lineitem contributes each matching orderkey ONCE to the
    * exchange (no row multiplication before the aggregate), and the
    * correlated `l_shipdate > o_orderdate` predicate rides the join
    * condition — no subquery materialization. At 100 TB both sides
    * shuffle on orderkey; the alternative (join + distinct) would
    * shuffle the multiplied rows first. Reference: the MR idiom was
    * a reduce-side join tagging order rows and emitting once if any
    * lineitem tag matched (`examples` join pattern, see
    * hadoop-mapreduce-examples Join.java). */
  def tpchQ4(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir).filter(
      col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
      col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_shipdate"))
    ord.join(li,
        col("l_orderkey") === col("o_orderkey") && col("l_shipdate") > col("o_orderdate"),
        "leftsemi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
  }

  /** TPC-H Q13-class: customer order-count distribution — LEFT outer
    * join with a predicate INSIDE the join condition (customers keep
    * their row when no non-urgent order matches), then a two-level
    * aggregate: orders per customer, customers per order-count. The
    * ON-clause filter is the trap this query exists for: written as a
    * WHERE it would silently drop the zero-order customers the
    * histogram's c_count=0 bucket reports. Scale: the first aggregate
    * reuses the join's c_custkey hash partitioning (no second
    * exchange — spec-asserted); the distribution agg shuffles the
    * tiny (custkey → count) relation. */
  def tpchQ13(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_custkey"))
      .join(Tables.orders(s, dir).select(col("o_custkey"), col("o_orderkey"), col("o_orderpriority")),
        col("c_custkey") === col("o_custkey") && col("o_orderpriority") =!= "1-URGENT",
        "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))

  /** TPC-H Q22-class: DORMANT customers with above-average positive
    * balance (no order since [[Q22Cutoff]] — this synthetic history
    * gives every customer SOME order, so the classic "no orders ever"
    * anti-join would be empty at every SF), by nation — a scalar
    * aggregate feeding a filter, plus an anti-join. The threshold is
    * computed with exact DECIMAL accumulation then ONE double
    * division (partition-order-proof, the k-means rule) and
    * crossJoined as a 1-row broadcast relation — the plan Spark
    * itself would produce for a scalar subquery, made explicit. The
    * anti-join broadcasts nothing at scale: both sides shuffle on
    * custkey; here AQE picks broadcast for the date-pruned orders
    * side. */
  val Q22Cutoff = "1999-01-01 00:00:00"
  def tpchQ22(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    val thr = cust.filter(col("c_acctbal") > 0.0)
      .agg((sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") /
        count(lit(1))).as("thr"))
    val recent = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit(Q22Cutoff).cast("timestamp"))
      .select(col("o_custkey"))
    cust.crossJoin(broadcast(thr))
      .filter(col("c_acctbal") > col("thr"))
      .join(recent, col("c_custkey") === col("o_custkey"), "leftanti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"),
        round(sum(col("c_acctbal")), 2).as("totacctbal"))
  }

  /** TPC-H Q12-class (shipping-priority audit): CONDITIONAL
    * aggregation over a join — the CASE lives in the aggregate, not a
    * WHERE, so one pass produces both the high- and low-priority
    * counts per group (the MR equivalent needed tagged counters in
    * one reducer; a naive translation runs the join twice). The
    * synthetic schema has no l_shipmode/l_receiptdate, so the
    * shape is keyed on l_returnflag with the Q12 date window on
    * l_shipdate; the priority split is the original's. Join shuffles
    * on orderkey; the CASE costs nothing extra. */
  def tpchQ12(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("low_line_count"))

  /** TPC-H Q14-class (promotion effect): a RATIO of conditional
    * aggregates — promo revenue share per ship-month. Both numerator
    * and denominator come out of ONE aggregation pass (CASE inside
    * sum); exact decimal accumulation cross-engine, one double
    * division at the end. The part dim is broadcast — the fact table
    * never shuffles for the join, only for the month rollup. */
  def tpchQ14(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-07-01").cast("timestamp"))
      .join(broadcast(Tables.part(s, dir).select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(date_trunc("month", col("l_shipdate")).as("ship_month"))
      .agg(
        (lit(100.0) *
          sum(when(col("p_type") === "PROMO",
              (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
                .cast("decimal(18,4)"))
            .otherwise(lit(0).cast("decimal(18,4)"))).cast("double") /
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double")).as("promo_revenue_pct"),
        count(lit(1)).as("n_items"))

  /** TPC-H Q16-class (supplier diversity): DISTINCT aggregation over
    * a many-to-many relation with a NOT-IN exclusion subquery. The
    * part-supplier relation is lineitem's distinct (partkey, suppkey)
    * pairs (no partsupp table in the synthetic schema); complaint
    * suppliers (negative acctbal) are anti-joined out BEFORE the
    * distinct count. Distinct agg = two-phase: (brand, size, supp)
    * dedup reusing the join's partitioning, then the count — the same
    * two-job MR chain Q16 always was. */
  def tpchQ16(s: SparkSession, dir: String): DataFrame = {
    val excluded = Tables.supplier(s, dir)
      .filter(col("s_acctbal") < 0.0).select(col("s_suppkey"))
    val partSupp = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    partSupp
      .join(excluded, col("l_suppkey") === col("s_suppkey"), "leftanti")
      .join(broadcast(Tables.part(s, dir)
          .filter(col("p_size").isin(5, 15, 25, 35))
          .select(col("p_partkey"), col("p_brand"), col("p_size"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_size"))
      .agg(count_distinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** TPC-H Q19-class (discounted revenue, disjunctive predicates): an
    * OR of brand/size/quantity conjunctions — the pushdown stress
    * shape. The disjunction references BOTH sides, so it can't prune
    * either scan alone; Catalyst still extracts the common
    * `p_brand IS IN (...)` implication onto the broadcast dim side
    * and evaluates the residual OR post-join in codegen. One
    * broadcast join, no fact shuffle before the final 1-row agg. */
  def tpchQ19(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)
          .select(col("p_partkey"), col("p_brand"), col("p_size"))),
        col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#11" && col("p_size").between(1, 10) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#22" && col("p_size").between(10, 20) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#33" && col("p_size").between(20, 30) &&
          col("l_quantity").between(20, 30)))
      .agg(
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))

  /** TPC-H Q6: forecast revenue — pure scan+filter+agg; the filters
    * must reach the parquet scan (asserted in specs). */
  def tpchQ6(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(
        col("l_shipdate") >= lit("1994-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1995-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(sum((col("l_extendedprice") * col("l_discount")).cast("decimal(18,4)")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))

  /** #33 Top-N per group (window rank, total tie-break). Customer is
    * a dimension here — broadcast it (pruned to the two join/group
    * columns) so the fact side never shuffles for the join; the only
    * exchange is the segment-partitioned window, which
    * WindowGroupLimit has already cut to ≤3 rows per segment per map
    * task. */
  def topkPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val cust = Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment"))
    Tables.orders(s, dir)
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("c_mktsegment"), col("rk"), col("o_orderkey"), col("o_totalprice"))
  }

  /** #33 Global top-N (rank over a single ordered exchange). */
  def topnGlobal(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  /** #34 Rollup report (grouping-set chains → one pass). */
  def rollupReport(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"), round(sum(col("l_quantity")), 2).as("sum_qty"))

  /** #34b Cube report: all grouping-set combinations in one pass. */
  def cubeReport(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("sum_price"))

  /** Fixed pivot column list — an EXPLICIT value list (not inferred)
    * so the output schema is deterministic and the plan skips the
    * extra distinct-values job Spark otherwise runs; at 100 TB an
    * inferred pivot is a full extra pass over the fact table. */
  val PivotTypes: Seq[String] = Seq("click", "view", "signup", "purchase", "error")

  /** #34b Pivot report (the reshape every MR shop hand-rolled with
    * per-key conditional sums in the reducer — the
    * `lib/aggregate/ValueAggregator` pattern with one aggregator per
    * pivot value): hourly event counts
    * fanned into one column per event type. Catalyst's pivot rewrite
    * plans two aggregates — the partial+final (hour, type) count over
    * the fact table, then PivotFirst whose exchange carries only the
    * reduced hours×types relation (spec-asserted: exactly 2
    * exchanges, no value-inference pass). Missing (hour, type) combos
    * are NULL on both engines (the oracle's sum(CASE) mirrors
    * pivot-count cell semantics exactly). */
  def pivotReport(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .groupBy(col("window_start"))
      .pivot("event_type", PivotTypes)
      .agg(count(lit(1)))

  /** #35 Windowed running aggregates + rank + lag. */
  def windowRunning(s: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate").asc, col("l_orderkey").asc, col("l_linenumber").asc, col("l_quantity").asc)
    Tables.lineitem(s, dir)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate"), col("l_quantity"))
      .withColumn("running_qty",
        round(sum(col("l_quantity")).over(ord.rowsBetween(Window.unboundedPreceding, 0)), 2))
      .withColumn("rk", row_number().over(ord))
      .withColumn("prev_qty", lag(col("l_quantity"), 1).over(ord))
      .drop("l_shipdate")
  }

  /** #35b VALUE-range window frame: per-customer trailing-7-day order
    * totals — `rangeBetween` over the event-time axis, the frame kind
    * ROWS can't express (peers at the same timestamp enter the frame
    * together; the reach-back is defined by TIME, not row count).
    * The MR-era equivalent was a secondary-sorted reducer holding a
    * manual sliding buffer. Deterministic without a row tie-break:
    * the frame is value-defined, so tied rows get identical frames
    * and symmetric aggregates. One shuffle (custkey); state per task
    * is one customer's frame. Both engines treat the 6-day boundary
    * as INCLUSIVE (RANGE ... PRECEDING includes the endpoint) — the
    * midnight-aligned synthetic dates make that boundary real. */
  def windowRangeFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").cast("long"))
      .rangeBetween(-6L * 86400, 0)
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        round(sum(col("o_totalprice")).over(w), 2).as("w7_price"),
        count(lit(1)).over(w).as("w7_orders"))
  }

  /** #36 Semi-structured JSON extraction from event props. */
  def jsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_val"))
      .filter(col("k_val").isNotNull)

  /** #37 Event-time tumbling-window aggregation (batch analogue of
    * the streaming query in graft.streaming.EventStreams). */
  def eventsWindowed(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(
        date_trunc("hour", col("ts")).as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))

  /** #37c SLIDING-window aggregation — the overlapping-window family
    * member next to tumbling (#37) and session (#38): 1-hour windows
    * advancing every 30 minutes, so each event lands in exactly TWO
    * windows (duration/slide). Spark's `window(ts, dur, slide)`
    * EXPLODES each row into its windows before the agg — the cost is
    * duration/slide× rows into the shuffle, which is why production
    * slides are coarse fractions of the duration, not seconds (that
    * case wants the tumbling-sub-window + rollup composition
    * instead). The MR analogue emitted one (window, event) pair per
    * covering window from the mapper — same explosion, same combiner
    * shape. */
  def eventsSliding(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** #37b Windowed anomaly detection: z-score of each hour's event
    * count against its type's distribution, flagging |z| ≥ 2. The
    * variance comes from integer power sums (Σn, Σn², count are
    * exact BIGINTs in both engines), so every double derived from
    * them is bit-identical cross-engine — the builtin `stddev`
    * aggregates doubles in partition order and is not. One shuffle
    * (the hourly agg); the per-type window runs over the tiny
    * (hour, type) relation. */
  def eventsAnomaly(s: SparkSession, dir: String): DataFrame = {
    val byType = Window.partitionBy(col("event_type"))
    val hourly = Tables.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val stats = hourly
      .withColumn("s1", sum(col("n_events")).over(byType))
      .withColumn("s2", sum(col("n_events") * col("n_events")).over(byType))
      .withColumn("cnt", count(lit(1)).over(byType))
    val mean = col("s1").cast("double") / col("cnt")
    val variance = (col("s2").cast("double") - col("s1").cast("double") * col("s1") / col("cnt")) / col("cnt")
    stats
      .withColumn("z",
        when(variance <= 0.0, lit(0.0))
          .otherwise((col("n_events") - mean) / sqrt(variance)))
      .select(col("window_start"), col("event_type"), col("n_events"),
        round(col("z"), 4).as("z"), (abs(col("z")) >= 2.0).as("is_anomaly"))
  }

  /** #38 Batch sessionization: gap>30min starts a new session —
    * gaps-and-islands with two window passes over one user_id shuffle. */
  def eventsSessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          (unix_millis(col("ts")) - unix_millis(col("prev_ts"))) > 30L * 60 * 1000, 1).otherwise(0))
      .groupBy(col("user_id"))
      .agg(
        sum(col("new_session")).cast("bigint").as("n_sessions"),
        count(lit(1)).as("n_events"))
  }
}
