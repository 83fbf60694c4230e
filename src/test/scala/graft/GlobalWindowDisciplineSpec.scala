package graft

import graft.operators.Dedup
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Whole-surface unpartitioned-window guard — third of the discipline
  * sweeps ([[BroadcastDisciplineSpec]], [[ScanDisciplineSpec]]): a
  * `Window.orderBy(...)` with no partition spec plans as a
  * single-partition sort — every input row funnels through ONE task,
  * which at 100 TB is the job. The house rule (the quantile-report
  * trade): a global window is legal ONLY over a relation whose size
  * is bounded by something other than the corpus — a post-`limit(k)`
  * top-k, a fixed bucket grid, a configuration-shaped duration range.
  * This spec enumerates every registered query's AQE-off plan,
  * collects Window/WindowGroupLimit nodes with an empty partition
  * spec, and fails any query not in the justified whitelist; a rot
  * check evicts entries whose query stops planning a global window.
  */
class GlobalWindowDisciplineSpec extends SparkSpecBase {

  test("every unpartitioned window runs over a declared bounded relation") {
    val saved = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      Dedup.clearCaches()
      def globals(name: String): Seq[String] = {
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.queryExecution.executedPlan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty =>
            w.windowExpression.map(_.name).mkString(",")
          case w: WindowGroupLimitExec if w.partitionSpec.isEmpty =>
            "group-limit"
        }
      }
      val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
        val g = globals(name)
        if (g.isEmpty || GlobalWindowDisciplineSpec.whitelist.contains(name)) None
        else Some(s"$name: global window(s) [${g.mkString("; ")}]")
      }
      assert(offenders.isEmpty,
        s"unpartitioned windows outside the whitelist:\n${offenders.mkString("\n")}")
      val stale = GlobalWindowDisciplineSpec.whitelist.keys.toSeq.sorted.filter { name =>
        !SparkEntry.queries.contains(name) || globals(name).isEmpty
      }
      assert(stale.isEmpty,
        s"whitelist entries with no global window left (remove them):\n${stale.mkString("\n")}")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", saved)
      Dedup.clearCaches()
    }
  }
}

object GlobalWindowDisciplineSpec {
  /** Declared bounded global windows: query → why the window's input
    * relation does not grow with the corpus. */
  val whitelist: Map[String, String] = Map(
    "search_bm25" ->
      "rank derives AFTER limit(TopK) — the window sees exactly k rows",
    "eval_rank" ->
      "inherits search_bm25's post-limit k-row rank window",
    "events_top_paths" ->
      "rank derives AFTER limit(PathTopK) — k rows",
    "tpch_q10" ->
      "row_number derives AFTER the global top-20 limit — 20 rows",
    "weighted_sample" ->
      "rank derives AFTER limit(WeightedK) — k rows",
    "sketch_kmv_merge" ->
      ("the k-min rank window runs over kept sketch rows — bounded by " +
        "k per sketch, never the stream"),
    "quantile_report_hist" ->
      ("the cumulative window runs over the equi-width histogram — at " +
        "most HistBuckets (8192) rows regardless of input size, the " +
        "declared bounded-memory tier"),
    "events_survival" ->
      ("the running-risk/product windows run over the per-lifetime " +
        "relation — bounded by the observation window in DAYS " +
        "(configuration-shaped), the declared quantile-report trade"),
    "eval_auc" ->
      ("the running rank-sum window runs over DISTINCT integer score " +
        "values (the Mann-Whitney tie groups) — bounded by the " +
        "scorer's value range, not corpus cardinality"))
}
