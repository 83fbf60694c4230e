package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Shared core of the round-15 shuffle census — the fourth permanent
  * discipline sweep's measuring stick, factored out so the sweep, its
  * witness, and the pin-(re)generation main ([[ShuffleCensusDump]])
  * count with literally the same code.
  *
  * The census of a query = number of `ShuffleExchangeExec` nodes in
  * its AQE-off / auto-broadcast-off physical plan, INCLUDING
  * - subquery plans (a scalar subquery's aggregation shuffles are
  *   real network cost the main-tree walk never visits), and
  * - every DISTINCT cached relation's build plan (deduped by shared
  *   CachedRDDBuilder, recursively). The dedup is WITHIN one query's
  *   plan — four lookups of one cache in a single query count its
  *   build once — but a cache shared ACROSS queries appears in each
  *   consuming query's pinned count (the dump generator iterates the
  *   same way, so pins and sweep agree; a re-pin diff therefore moves
  *   every consumer of a changed shared cache at once).
  *
  * Census config mirrors the other sweeps: AQE off so exchanges are
  * concrete plan nodes (not runtime stages), auto-broadcast OFF so
  * every non-hinted join plans as its shuffle shape — the count is a
  * plan-shape FACT independent of table statistics, and an upper
  * bound on what any statistics-driven plan would shuffle. */
object ShuffleCensus {

  /** All plans reachable from `p`: itself, its subquery plans, and
    * each distinct cache build (recursively), deduped by builder so
    * four lookups of one cache count its build ONCE. */
  private def reachable(p: SparkPlan): Seq[SparkPlan] = {
    // Reference-identity set, NOT Set[Int] of identityHashCode: hash
    // codes are not unique, and a collision would silently drop a
    // cache build's shuffles from the census.
    val seenBuilders = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[AnyRef, java.lang.Boolean]())
    var acc = Seq.empty[SparkPlan]
    // subqueriesAll, not subqueries: the latter is this NODE's own
    // expression subqueries only — a scalar subquery under a child
    // Filter would escape the census (the witness pins this).
    def withSubqueries(q: SparkPlan): Seq[SparkPlan] =
      q +: q.subqueriesAll
    def visit(q: SparkPlan): Unit = {
      val trees = withSubqueries(q)
      acc ++= trees
      trees.foreach(_.foreach {
        case c: InMemoryTableScanExec =>
          if (seenBuilders.add(c.relation.cacheBuilder))
            visit(c.relation.cachedPlan)
        case _ => ()
      })
    }
    visit(p)
    acc
  }

  /** Shuffle count of one physical plan under the census rules. */
  def countPlan(p: SparkPlan): Int =
    reachable(p).map(_.collect { case s: ShuffleExchangeExec => s }.size).sum

  private val warmedDirs =
    new java.util.concurrent.ConcurrentHashMap[String, Unit]()

  /** Round-16 determinism fix, shared by ALL whole-surface sweeps and
    * dumps: censuses must not depend on which sweep ran FIRST in the
    * JVM. Build-once artifact memos (Similarity.ivfIndexDirs,
    * Curation.dedupTierDir, the Learn/EventStreams dirs maps) survive
    * clearCaches BY DESIGN, and their builders side-effect-create
    * liveCaches memos — so a fresh-JVM sweep saw ann_pq_adc at 8
    * exchanges (the PQ serve tier's build had just materialized the
    * shared melt/codebook/codes memos) while every later sweep saw
    * the build skipped and adc plan cold at 9. The fix pins every
    * census at the artifacts-WARM fixed point: construct every
    * registered query once per (JVM, sfDir) — building all artifacts
    * — then clear caches; from then on sweep N ≡ sweep N+1 whatever
    * the suite order. (The other leak class, a bare .persist()
    * surviving clearCaches, is fixed at its one occurrence —
    * heavy_hitters pass1 — by routing it through liveCaches.)
    *
    * The guard is BLOCKING (computeIfAbsent's mapping function runs
    * the warm pass): a late concurrent caller waits for the first
    * caller's warm pass to finish instead of censusing mid-warm —
    * the non-blocking `Set.add` guard would reintroduce exactly the
    * order-dependent census this fixes if ScalaTest parallel suite
    * execution were ever enabled. (The liveCaches nested-
    * computeIfAbsent hazard does not apply here: warmedDirs is a
    * dedicated map whose builder never touches warmedDirs again —
    * queries have no path to ensureWarm.) */
  def ensureWarm(spark: SparkSession, sfDir: String): Unit =
    warmedDirs.computeIfAbsent(sfDir, _ => {
      graft.operators.Dedup.clearCaches()
      SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
        SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan
        ()
      }
      graft.operators.Dedup.clearCaches()
    })

  /** Shuffle census of one registered query. Caller is responsible
    * for the census config (AQE off, auto-broadcast off) — the sweep
    * and the dump both set it around the whole sorted iteration so
    * cache-reuse state is identical in both. */
  def censusOf(spark: SparkSession, sfDir: String, name: String): Int =
    countPlan(SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan)

  /** Census of the whole registered surface, sorted query order —
    * the exact procedure whose output the pins freeze. */
  def sweep(spark: SparkSession, sfDir: String): Seq[(String, Int)] = {
    val keys = Seq("spark.sql.adaptive.enabled", "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      ensureWarm(spark, sfDir)
      graft.operators.Dedup.clearCaches()
      SparkEntry.queries.keys.toSeq.sorted.map { name =>
        name -> censusOf(spark, sfDir, name)
      }
    } finally {
      saved.foreach { case (k, v) => spark.conf.set(k, v) }
      graft.operators.Dedup.clearCaches()
    }
  }
}

/** Regenerates the [[ShuffleDisciplineSpec.pinned]] map after a
  * DELIBERATE plan change: `sbt 'Test/runMain graft.ShuffleCensusDump'`
  * prints the Scala source of the map; paste it over the old pins and
  * read the diff — every changed count is a shuffle consciously added
  * or removed, which is the whole point of pinning. */
object ShuffleCensusDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-shuffle-census")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val rows = ShuffleCensus.sweep(spark, sfDir)
    val src = "  val pinned: Map[String, Int] = Map(\n" +
      rows.map { case (n, c) => s"""    "$n" -> $c""" }.mkString(",\n") +
      "\n  )\n"
    println(src)
    // Also land it in a file: pane scrollback is a lousy clipboard.
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/tmp/shuffle_pins.scala"),
      src.getBytes("UTF-8"))
    spark.stop()
  }
}
