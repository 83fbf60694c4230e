package graft

import graft.operators.JobControl
import graft.operators.JobControl.{DependentFailed, Failed, Job, Success}
import org.apache.spark.sql.functions._

class JobControlSpec extends SparkSpecBase {

  test("jobcontrol_run: all jobs succeed, report matches the data") {
    val rows = JobControl.demoRun(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val nSources = Tables.documents(spark, sfDir)
      .select(col("source")).distinct().count()
    assert(rows("stats") == (("SUCCESS", nSources)))
    assert(rows("top_sources") == (("SUCCESS", math.min(3L, nSources))))
    assert(rows("quality")._1 == "SUCCESS")
    assert(rows("quality")._2 <= nSources)
  }

  test("failure cancels exactly the descendants; independent branches run") {
    import spark.implicits._
    val ran = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobs = Seq(
      Job("a", Nil, _ => { ran.incrementAndGet(); Seq(1, 2, 3).toDF("x") }),
      Job("b", Seq("a"), _ => throw new RuntimeException("boom: job b failed")),
      Job("c", Seq("b"), deps => deps("b").select(col("x"))),
      Job("e", Seq("c"), deps => deps("c")),
      Job("d", Seq("a"), deps => deps("a").filter(col("x") > 1)))
    val (outs, report) = JobControl.run(spark, jobs)
    val st = report.map(r => r.name -> r).toMap
    assert(st("a").state == Success && st("a").rows == 3)
    assert(st("b").state == Failed)
    assert(st("b").error.exists(_.contains("boom")),
      "the report must carry the real failure message")
    // Downstream-cancel is TRANSITIVE: c depends on the failed b, e
    // depends on the cancelled c — neither body may run.
    assert(st("c").state == DependentFailed)
    assert(st("e").state == DependentFailed)
    // The independent branch under a still runs to completion.
    assert(st("d").state == Success && st("d").rows == 2)
    assert(outs.keySet == Set("a", "d"))
  }

  test("shared intermediate: one computation, persisted, handed to both consumers") {
    import spark.implicits._
    val built = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobs = Seq(
      Job("base", Nil, _ => { built.incrementAndGet(); Seq(1, 2, 3, 4).toDF("x") }),
      Job("left", Seq("base"), deps => deps("base").filter(col("x") <= 2)),
      Job("right", Seq("base"), deps => deps("base").filter(col("x") > 2)))
    val (outs, report) = JobControl.run(spark, jobs)
    assert(report.forall(_.state == Success))
    // The body ran ONCE; both consumers received the same persisted
    // DataFrame (reference sharing is the in-process form of the
    // reference's HDFS-path handoff).
    assert(built.get == 1)
    assert(outs("base").storageLevel.useMemory,
      "the shared intermediate must be persisted, not recomputed per consumer")
    assert(outs("left").count() + outs("right").count() == outs("base").count())
  }

  test("ingest_night: the composed incremental DAG runs clean and its figures cross-check") {
    graft.operators.Dedup.clearCaches()
    val report = JobControl.ingestNight(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(report.keySet ==
      Set("exact_dedup", "near_dedup", "accept", "rollup_merge", "manifest"))
    assert(report.values.forall(_._1 == "SUCCESS"))
    // Both dedup faces classify the same batch (one row per batch doc).
    val batch = report("exact_dedup")._2
    assert(batch > 0 && report("near_dedup")._2 == batch)
    // The diamond: accept intersects the two verdicts, so it can never
    // exceed either face, and the manifest rolls accepted docs by
    // source (≤ accept rows, > 0 whenever anything was accepted).
    val accepted = report("accept")._2
    assert(accepted <= batch)
    assert(report("manifest")._2 <= math.max(accepted, 1))
    assert(report("rollup_merge")._2 > 0)
  }

  test("malformed DAGs fail loudly: cycles, unknown deps, duplicate names") {
    import spark.implicits._
    def df = Seq(1).toDF("x")
    val cyc = intercept[IllegalArgumentException] {
      JobControl.run(spark, Seq(
        Job("a", Seq("b"), _ => df), Job("b", Seq("a"), _ => df)))
    }
    assert(cyc.getMessage.contains("cycle"))
    val unknown = intercept[IllegalArgumentException] {
      JobControl.run(spark, Seq(Job("a", Seq("ghost"), _ => df)))
    }
    assert(unknown.getMessage.contains("ghost"))
    intercept[IllegalArgumentException] {
      JobControl.run(spark, Seq(Job("a", Nil, _ => df), Job("a", Nil, _ => df)))
    }
  }
}
