package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

/** Sixth permanent discipline sweep — the MEMO LIFECYCLE census.
  *
  * Round 16's driver bench died with
  * `IllegalStateException("Recursive update")`: eval_confusion's
  * builder ran inside `liveCaches.computeIfAbsent` and (via
  * nbClassify → nbGrid) reached ANOTHER `computeIfAbsent` on the same
  * ConcurrentHashMap. CHM throws whenever the outer and inner keys
  * land in one hash bin, and bin placement depends on
  * `System.identityHashCode(session)` inside the cache key — so the
  * crash was per-JVM-run roulette: Verify, the full suite, and the
  * quiet bench all passed the same day the driver's bench died.
  *
  * The fix is structural, and this sweep pins it: every liveCaches
  * entry is CREATED through the one house helper
  * ([[graft.operators.Dedup.memo]] / `memoKeyed`: get → build →
  * putIfAbsent, which never holds a bin lock while a builder runs, so
  * builders may nest arbitrarily), and `computeIfAbsent` on
  * liveCaches is banned source-wide. Direct map access is pinned to
  * an exact (file, method) multiset — the helper's own internals plus
  * the three cleanup-REGISTRATION `put` sites (keys embed the
  * registered plan's identityHashCode; a plain put has no mapping
  * function and therefore no nesting hazard). Observed != pinned
  * fails in either direction, same contract as the other five sweeps.
  */
class MemoDisciplineSpec extends SparkSpecBase {

  private val srcRoot = Paths.get("src/main/scala/graft")

  private def sources: Seq[(String, String)] =
    Files.walk(srcRoot).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .map(p => p.toString -> new String(Files.readAllBytes(p), "UTF-8"))
      .toSeq

  test("liveCaches.computeIfAbsent is banned everywhere in src/main") {
    val offenders = sources.collect {
      case (path, text) if text.contains("liveCaches.computeIfAbsent") => path
    }
    assert(offenders.isEmpty,
      s"nested-capable computeIfAbsent on liveCaches (the Recursive-update " +
        s"crash class) reintroduced in: ${offenders.mkString(", ")} — " +
        "route the memo through Dedup.memo/memoKeyed instead")
  }

  test("direct liveCaches access is pinned to the house helper + registration puts") {
    // (file basename, method) -> count. The helper's internals live in
    // Dedup.scala (memoKeyed's get/putIfAbsent, clearCaches's
    // values/clear); the three puts register already-persisted frames
    // under identity-unique keys purely so clearCaches can free them.
    val pinned = Map(
      ("Dedup.scala", "get") -> 1,
      ("Dedup.scala", "putIfAbsent") -> 1,
      ("Dedup.scala", "values") -> 1,
      ("Dedup.scala", "clear") -> 1,
      ("TextAnalysis.scala", "put") -> 1,
      ("JobControl.scala", "put") -> 1,
      ("Curation.scala", "put") -> 1)
    val ref = """liveCaches\.(\w+)""".r
    val observed = sources.flatMap { case (path, text) =>
      val base = Paths.get(path).getFileName.toString
      ref.findAllMatchIn(text).map(m => (base, m.group(1)))
    }.groupBy(identity).map { case (k, v) => k -> v.size }
    assert(observed == pinned,
      s"liveCaches access census drifted.\n  extra/changed: " +
        s"${(observed.toSet -- pinned.toSet).toSeq.sorted}\n  missing: " +
        s"${(pinned.toSet -- observed.toSet).toSeq.sorted}\n" +
        "A NEW creation path must go through Dedup.memo/memoKeyed; a new " +
        "registration put must be pinned here with its no-builder rationale.")
  }

  // ---- forced-collision witnesses ------------------------------------
  // "Aa" and "BB" share a String.hashCode (2112), so both keys land in
  // one bin of any small ConcurrentHashMap — the exact geometry that
  // made the driver bench crash nondeterministic is made DETERMINISTIC
  // here, in both directions.

  test("witness: nested computeIfAbsent on same-bin keys throws Recursive update") {
    val m = new java.util.concurrent.ConcurrentHashMap[String, String]()
    assert("Aa".hashCode == "BB".hashCode)
    val ex = intercept[IllegalStateException] {
      m.computeIfAbsent("Aa", _ => m.computeIfAbsent("BB", _ => "inner"))
    }
    assert(ex.getMessage.contains("Recursive update"))
  }

  test("witness: nested house memo on the same same-bin keys is safe") {
    import graft.operators.Dedup
    Dedup.clearCaches()
    try {
      val outer = Dedup.memoKeyed("Aa") {
        val inner = Dedup.memoKeyed("BB")(spark.range(1).toDF("inner_id"))
        inner.select(col("inner_id").as("outer_id"))
      }
      assert(outer.columns.sameElements(Array("outer_id")))
      // Both entries memoized: the second lookup returns the same frame.
      val again = Dedup.memoKeyed("BB")(sys.error("must not rebuild"))
      assert(again.columns.sameElements(Array("inner_id")))
    } finally Dedup.clearCaches()
  }

  test("full-surface construction leaves ZERO caches after clearCaches (no persist escapes liveCaches)") {
    // The runtime face of CLAUDE.md's bare-persist ban, previously
    // enforced only by review: every `.persist()` in src/main must
    // register its frame in liveCaches (via memo or a pinned put) or
    // clearCaches can't free it — the round-16 heavy_hitters leak let
    // bench reps 2+ silently reuse a materialized cache. Constructing
    // a query runs its builder (persists register in the CacheManager
    // at .persist() call time, not at materialization), so building
    // the whole surface then clearing must leave the manager EMPTY;
    // any survivor is a persist that escaped the registry. Scoped
    // try/finally persists (namedOutputsRoundTrip) release before the
    // builder returns and never reach this point. localCheckpoints
    // are RDD-level persists, not CacheManager entries — exempt by
    // construction, which is correct: they're lineage cuts, freed by
    // GC/ContextCleaner, not pipeline caches.
    import org.apache.spark.sql.graft.TestCache
    TestCache.clearAll(spark)
    graft.operators.Dedup.clearCaches()
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir)
      ()
    }
    graft.operators.Dedup.clearCaches()
    assert(TestCache.isEmpty(spark),
      "a .persist() escaped liveCaches (clearCaches cannot free it); " +
        "persistent RDDs still registered: " +
        spark.sparkContext.getPersistentRDDs.values.map(_.name).mkString("; "))
  }

  test("witness: a memo race's loser unpersists its copy and adopts the winner") {
    // The helper's documented non-atomicity trade: two threads may
    // both run the builder, but the loser's persisted frame must be
    // freed (else clearCaches could never reach it — the orphaned-
    // cache variant of the heavy_hitters leak). A latch holds BOTH
    // builders open until each has produced its frame, forcing the
    // race deterministically.
    import graft.operators.Dedup
    import org.apache.spark.storage.StorageLevel
    Dedup.clearCaches()
    try {
      val bothBuilt = new java.util.concurrent.CountDownLatch(2)
      val built = java.util.Collections.synchronizedList(
        new java.util.ArrayList[org.apache.spark.sql.DataFrame]())
      val results = java.util.Collections.synchronizedList(
        new java.util.ArrayList[org.apache.spark.sql.DataFrame]())
      val threads = (1 to 2).map { i =>
        new Thread(() => {
          val r = Dedup.memoKeyed("race-witness") {
            val df = spark.range(i).toDF("race_id")
              .persist(StorageLevel.MEMORY_AND_DISK)
            built.add(df)
            bothBuilt.countDown()
            // Wait for the other builder so BOTH frames exist before
            // either putIfAbsent runs — guaranteeing a real loser.
            // Timed: a builder failure before countDown must fail the
            // test, not hang the whole suite in an un-countable await.
            assert(bothBuilt.await(30, java.util.concurrent.TimeUnit.SECONDS),
              "peer builder never arrived — check for a builder throw")
            df
          }
          results.add(r)
          ()
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(built.size == 2, "latch must force a double-build")
      // Both callers got the SAME winning frame...
      assert(results.get(0) eq results.get(1),
        "racing callers must converge on one memoized frame")
      val winner = results.get(0)
      val loser = if (built.get(0) eq winner) built.get(1) else built.get(0)
      // ...the winner stays persisted, the loser was freed.
      assert(winner.storageLevel != StorageLevel.NONE, "winner must stay persisted")
      assert(loser.storageLevel == StorageLevel.NONE, "loser must be unpersisted")
    } finally Dedup.clearCaches()
  }

  test("witness: a PLAN-EQUAL memo race must not de-materialize the winner") {
    // The realistic race: both threads run the SAME builder, so the
    // CacheManager holds ONE entry for both frames (the second
    // .persist() is a no-op against the first's by canonicalized plan
    // equality). A naive loser-unpersist would remove that shared
    // entry, leaving the memoized winner at StorageLevel.NONE and
    // every later consumer re-paying the pass the memo amortizes —
    // memoKeyed must detect plan equality and skip the unpersist.
    import graft.operators.Dedup
    import org.apache.spark.storage.StorageLevel
    Dedup.clearCaches()
    try {
      val bothBuilt = new java.util.concurrent.CountDownLatch(2)
      val results = java.util.Collections.synchronizedList(
        new java.util.ArrayList[org.apache.spark.sql.DataFrame]())
      val threads = (1 to 2).map { _ =>
        new Thread(() => {
          val r = Dedup.memoKeyed("race-witness-eq") {
            val df = spark.range(7).toDF("race_id")
              .persist(StorageLevel.MEMORY_AND_DISK)
            bothBuilt.countDown()
            assert(bothBuilt.await(30, java.util.concurrent.TimeUnit.SECONDS),
              "peer builder never arrived — check for a builder throw")
            df
          }
          results.add(r)
          ()
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(results.get(0) eq results.get(1),
        "racing callers must converge on one memoized frame")
      assert(results.get(0).storageLevel != StorageLevel.NONE,
        "plan-equal loser unpersist de-materialized the shared cache entry")
    } finally Dedup.clearCaches()
  }

  test("witness: the round-16 crasher itself (eval_confusion) builds through nested memos") {
    graft.operators.Dedup.clearCaches()
    try {
      // Constructing the plan exercises confcells → nbClassify →
      // nbGrid's memo nesting; with computeIfAbsent this was the
      // per-JVM-roulette crash, with the house memo it cannot throw.
      val df = SparkEntry.queries("eval_confusion")(spark, sfDir)
      assert(df.queryExecution.executedPlan != null)
    } finally graft.operators.Dedup.clearCaches()
  }
}
