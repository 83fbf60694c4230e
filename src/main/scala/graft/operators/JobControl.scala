package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DAG-of-dependent-jobs orchestration (SURVEY §2.1 #19b) — the
  * `lib/jobcontrol` surface: `JobControl.java` ran a set of
  * `ControlledJob`s respecting dependencies, moving each through
  * WAITING → READY → RUNNING → SUCCESS/FAILED, and marking every job
  * downstream of a failure DEPENDENT_FAILED instead of running it.
  *
  * Spark-first restatement: most reference-era job CHAINS collapse
  * into one Catalyst plan here (see [[Curation.corpusCurate]]), so
  * what remains genuinely orchestration is the contract this utility
  * keeps: (1) dependency-ordered execution, (2) each job's output
  * persisted ONCE and handed to every downstream consumer (the
  * shared-intermediate contract — reference jobs handed off through
  * HDFS paths; here it's a persisted DataFrame, at 100 TB a parquet
  * handoff like [[Similarity.ivfIndexDir]]), (3) failure isolation —
  * a failed job cancels exactly its descendants, independent branches
  * still run, and the report says which was which.
  *
  * Ready jobs are submitted in name order, one at a time: Spark's own
  * scheduler supplies intra-job parallelism (every job is a
  * distributed plan), and deterministic submission keeps the report
  * reproducible. Reference: `lib/jobcontrol/JobControl.java`,
  * `ControlledJob.java` (public Hadoop 2.10.0 tree).
  */
object JobControl {

  sealed abstract class State(val label: String)
  case object Success extends State("SUCCESS")
  case object Failed extends State("FAILED")
  case object DependentFailed extends State("DEPENDENT_FAILED")

  /** One DAG node: `body` receives the already-computed (persisted)
    * outputs of its dependencies by name. */
  final case class Job(name: String, deps: Seq[String],
      body: Map[String, DataFrame] => DataFrame)

  final case class JobResult(name: String, state: State, rows: Long,
      error: Option[String])

  /** Run the DAG to completion. Returns (successful outputs by name,
    * one JobResult per job). Malformed DAGs (duplicate names, unknown
    * or cyclic dependencies) throw — an orchestration config error
    * must fail loudly, not report a half-run. */
  def run(s: SparkSession, jobs: Seq[Job]): (Map[String, DataFrame], Seq[JobResult]) = {
    val byName = jobs.map(j => j.name -> j).toMap
    require(byName.size == jobs.size, "jobcontrol: duplicate job names")
    for (j <- jobs; d <- j.deps)
      require(byName.contains(d), s"jobcontrol: job '${j.name}' depends on unknown job '$d'")
    val states = scala.collection.mutable.Map[String, State]()
    val outs = scala.collection.mutable.Map[String, DataFrame]()
    val rows = scala.collection.mutable.Map[String, Long]()
    val errors = scala.collection.mutable.Map[String, String]()
    while (states.size < jobs.size) {
      var progress = false
      for (j <- jobs.sortBy(_.name) if !states.contains(j.name)) {
        val depStates = j.deps.map(states.get)
        if (depStates.exists(_.exists(_ != Success))) {
          // ≥1 dependency resolved non-SUCCESS: cancel this job (and,
          // transitively on later passes, everything below it).
          states(j.name) = DependentFailed
          rows(j.name) = 0L
          progress = true
        } else if (depStates.forall(_.contains(Success))) {
          // NonFatal only: an OutOfMemoryError/fatal JVM error must
          // propagate, not become a per-job FAILED row on a broken
          // JVM that then keeps orchestrating.
          try {
            val df = j.body(j.deps.map(d => d -> outs(d)).toMap)
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            // The count both materializes the persisted blocks (so
            // downstream consumers share ONE computation) and is the
            // report's row figure. If it throws, the persist is rolled
            // back — a FAILED job must not leave a half-materialized
            // plan registered in the CacheManager for the session.
            try {
              rows(j.name) = df.count()
              outs(j.name) = df
              // Registered for end-of-pipeline cleanup (clearCaches).
              Dedup.liveCaches.put(
                s"jobctl|${j.name}|${System.identityHashCode(df)}", df)
              states(j.name) = Success
            } catch { case t: Throwable => df.unpersist(); throw t }
          } catch {
            case scala.util.control.NonFatal(t) =>
              states(j.name) = Failed
              rows(j.name) = 0L
              errors(j.name) = Option(t.getMessage).getOrElse(t.getClass.getName)
          }
          progress = true
        }
      }
      if (!progress && states.size < jobs.size) {
        val stuck = jobs.map(_.name).filterNot(states.contains).sorted
        throw new IllegalArgumentException(
          s"jobcontrol: dependency cycle among ${stuck.mkString(", ")}")
      }
    }
    val report = jobs.sortBy(_.name).map(j =>
      JobResult(j.name, states(j.name), rows(j.name), errors.get(j.name)))
    (outs.toMap, report)
  }

  /** #19b driver surface: a 3-node DAG — `stats` (per-source doc/token
    * inventory) feeding two independent consumers, `top_sources`
    * (top-3 by token mass) and `quality` (sources clearing a doc-count
    * floor). Both consumers read the SAME persisted `stats` relation,
    * which is the shared-intermediate contract under test. The report
    * (job, state, n_rows) is deterministic, so the DuckDB oracle
    * states it with three scalar subqueries. */
  def demoRun(s: SparkSession, dir: String): DataFrame = {
    val stats = Job("stats", Nil, _ =>
      Tables.documents(s, dir)
        .select(col("source"), size(tokens(col("text"))).as("n_tok"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).cast("bigint").as("n_tokens")))
    val top = Job("top_sources", Seq("stats"), deps =>
      deps("stats").orderBy(col("n_tokens").desc, col("source").asc).limit(3))
    val quality = Job("quality", Seq("stats"), deps =>
      deps("stats").filter(col("n_docs") >= 5))
    val (_, report) = run(s, Seq(stats, top, quality))
    import s.implicits._
    report.map(r => (r.name, r.state.label, r.rows))
      .toDF("job", "state", "n_rows")
  }

  /** #19c The composed NIGHTLY-INGEST DAG — the three incremental
    * faces ([[Dedup.exactIncremental]], [[Dedup.nearIncremental]],
    * [[Aggregators.aggIncremental]]) driven as one orchestrated run,
    * the chain `lib/jobcontrol` existed to drive (reference:
    * `JobControl.java` sequencing the nightly dedup → accept →
    * rollup jobs through HDFS handoffs). Proves the persisted-index
    * contracts COMPOSE: each face classifies tonight's batch against
    * its own corpus-side artifact (hash index / LSH band index /
    * partial-aggregate state), `accept` intersects the two dedup
    * verdicts, `manifest` rolls accepted docs up by source, and
    * `rollup_merge` maintains the materialized aggregate on the
    * independent fact-table branch — five jobs, two independent
    * roots, one diamond join.
    *
    * Scale shape: every job body is one of the already-scale-shaped
    * incremental operators (corpus text never read, batch text never
    * shuffled, state relations group- or index-sized); the DAG adds
    * only the doc_id-keyed intersect of two disposition relations
    * (batch-sized, two columns). The report (job, state, n_rows) is
    * deterministic, so the DuckDB oracle recomputes every figure. */
  def ingestNight(s: SparkSession, dir: String): DataFrame = {
    val exactJob = Job("exact_dedup", Nil, _ => Dedup.exactIncremental(s, dir))
    val nearJob = Job("near_dedup", Nil, _ => Dedup.nearIncremental(s, dir))
    val accept = Job("accept", Seq("exact_dedup", "near_dedup"), deps =>
      deps("exact_dedup").filter(col("disposition") === "new_unique")
        .select(col("doc_id"))
        .join(deps("near_dedup").filter(col("disposition") === "new_unique")
          .select(col("doc_id")), Seq("doc_id")))
    val rollup = Job("rollup_merge", Nil, _ => Aggregators.aggIncremental(s, dir))
    val manifest = Job("manifest", Seq("accept"), deps =>
      Tables.documents(s, dir)
        .join(deps("accept"), Seq("doc_id"))
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs")))
    val (_, report) = run(s, Seq(exactJob, nearJob, accept, rollup, manifest))
    import s.implicits._
    report.map(r => (r.name, r.state.label, r.rows))
      .toDF("job", "state", "n_rows")
  }
}
