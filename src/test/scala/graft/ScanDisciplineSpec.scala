package graft

import graft.operators.Dedup
import org.apache.spark.sql.execution.FileSourceScanExec

/** Whole-surface scan-amplification guard — the round-14 companion to
  * [[BroadcastDisciplineSpec]]: under AQE-off planning, no registered
  * query may READ A HEAVY COLUMN (text, embedding — the columns that
  * dominate corpus IO at 100 TB) from the same table in two or more
  * scans, unless the query is whitelisted as declared role
  * separation. The class this guards against: a corpus-pass aggregate
  * consumed by k branches re-runs the tokenize k times, because
  * exchange reuse does NOT deduplicate branches whose pushed
  * isnotnull filters canonicalize their scans apart (measured round
  * 14 — zero ReusedExchange at runtime). The fix is the CLAUDE.md
  * persist rule or deriving from a bounded relation; this spec keeps
  * the fixed families fixed and forces every future multi-scan to
  * either share one pass or justify itself in the whitelist.
  *
  * Scans whose pushed data filters bound the row count (the serve
  * faces' `vec_id < NumQueries` probes) still count — the whitelist
  * entry states the bound; silent exclusion would let a real
  * amplification hide behind any pushed predicate.
  */
class ScanDisciplineSpec extends SparkSpecBase {

  private val heavy = Set("text", "embedding")

  test("no registered query reads a heavy column from the same table in 2+ scans (whitelisted role separation aside)") {
    val saved = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      Dedup.clearCaches()
      def census(name: String): Map[String, Int] = {
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.queryExecution.executedPlan.collect {
          case f: FileSourceScanExec
              if f.requiredSchema.fieldNames.exists(heavy) =>
            f.relation.location.rootPaths.headOption.map(_.getName).getOrElse("?")
        }.groupBy(identity).view.mapValues(_.size).toMap.filter(_._2 >= 2)
      }
      val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
        val hot = census(name)
        if (hot.isEmpty || ScanDisciplineSpec.whitelist.contains(name)) None
        else Some(s"$name: ${hot.map { case (t, n) => s"$t x$n" }.mkString(", ")}")
      }
      assert(offenders.isEmpty,
        s"heavy-column scan amplification outside the whitelist:\n${offenders.mkString("\n")}")
      // Whitelist rot check (the BroadcastDisciplineSpec rule): every
      // entry must still exist and still multi-scan — a fixed query
      // must leave the list so the entry can't shadow a regression.
      val stale = ScanDisciplineSpec.whitelist.keys.toSeq.sorted.filter { name =>
        !SparkEntry.queries.contains(name) || census(name).isEmpty
      }
      assert(stale.isEmpty,
        s"whitelist entries with no heavy multi-scan left (remove them):\n${stale.mkString("\n")}")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", saved)
      Dedup.clearCaches()
    }
  }
}

object ScanDisciplineSpec {
  /** Declared role separations: query → why its heavy re-scan is two
    * genuinely different passes, not one pass computed twice. */
  val whitelist: Map[String, String] = Map(
    "nb_classify_topv" ->
      ("model pass (the top-V cap\u0027s count-ordered vocabulary window " +
        "reads the persisted grid, but the capped-grid REBUILD tokenizes) " +
        "+ inference pass (per-doc tokens) — the train-vs-classify role " +
        "split production puts in two tables"),
    "assoc_rules" ->
      ("item-count job + pair-count job — the apriori two-job shape the " +
        "reference itself ran over its input twice"),
    "ann_bruteforce" ->
      ("corpus side + query side of the same embeddings table — separate " +
        "tables in a production serving layout"),
    "dedup_embedding" ->
      "same corpus-vs-query role split as ann_bruteforce",
    "ann_pq_serve" ->
      ("one full re-rank fetch + the query-side reads (vec_id < Q pushed " +
        "to the scan — Q-row bounded); the four per-subspace lookups now " +
        "share one persisted ADC distance table"),
    "ann_ivf_pq_serve" ->
      "same as ann_pq_serve plus the Q-bounded coarse-probe read",
    "ann_ivf_serve" ->
      ("the persisted assignments artifact read as the cluster-pruned " +
        "CANDIDATE side and as the Q-bounded QUERY side (vec_id < Q " +
        "pushed to the scan) — the serve layout's two roles"),
    "knn_classify" ->
      "same corpus-vs-query role split as ann_bruteforce")
}
