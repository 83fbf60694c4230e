package graft

import graft.operators.Pipe
import org.apache.spark.sql.functions._

/** The real-subprocess streaming pipe (hadoop-streaming
  * PipeMapper contract): stdin write, stdout read, EOF signaling,
  * exit-status propagation — each across multiple partitions, i.e.
  * multiple concurrent subprocesses. */
class PipeSpec extends SparkSpecBase {

  private def binPresent(p: String) = new java.io.File(p).exists()

  test("pipe through /bin/cat round-trips every line across 4 partitions") {
    assume(binPresent("/bin/cat"))
    import spark.implicits._
    val in = (0 until 1000).map(i => s"line-$i-payload")
    val piped = Pipe.pipeThrough(
      spark.createDataset(in).repartition(4), Seq("/bin/cat")).collect()
    // cat preserves content and per-partition order; global order is
    // partition-interleaved, so compare as sorted multisets.
    assert(piped.sorted.toSeq == in.sorted)
  }

  test("one subprocess per partition: wc -l emits one count per partition, summing to n") {
    assume(binPresent("/usr/bin/wc"))
    import spark.implicits._
    val piped = Pipe.pipeThrough(
      spark.createDataset((0 until 1000).map(i => s"row $i")).repartition(4),
      Seq("/usr/bin/wc", "-l")).collect()
    assert(piped.length == 4) // one aggregated line per subprocess
    assert(piped.map(_.trim.toLong).sum == 1000L)
  }

  test("a transforming command is applied: tr lowercases on the way through") {
    assume(binPresent("/usr/bin/tr"))
    import spark.implicits._
    val piped = Pipe.pipeThrough(
      spark.createDataset(Seq("ABC", "DeF", "ghi")).repartition(2),
      Seq("/usr/bin/tr", "A-Z", "a-z")).collect()
    assert(piped.sorted.toSeq == Seq("abc", "def", "ghi"))
  }

  test("nonzero exit status fails the task (PipeMapRed contract)") {
    assume(binPresent("/bin/sh"))
    import spark.implicits._
    val ex = intercept[Exception] {
      Pipe.pipeThrough(
        spark.createDataset((0 until 100).map(_.toString)).repartition(2),
        Seq("/bin/sh", "-c", "exit 3")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("exited 3")), messages(ex).mkString(" | "))
  }

  test("early-closing command (head) still succeeds: broken pipe is not an error") {
    assume(binPresent("/usr/bin/head"))
    import spark.implicits._
    val piped = Pipe.pipeThrough(
      spark.createDataset((0 until 10000).map(i => s"x$i")).repartition(2),
      Seq("/usr/bin/head", "-n", "3")).collect()
    assert(piped.length == 6) // 3 per partition; feeder's broken pipe swallowed
  }

  test("a failure while feeding stdin fails the task instead of truncating output") {
    assume(binPresent("/bin/cat"))
    import spark.implicits._
    val poisoned = spark.createDataset((0 until 100).map(_.toString)).repartition(2)
      .mapPartitions(_.map { x =>
        if (x == "57") throw new RuntimeException("feed boom") else x
      })
    val ex = intercept[Exception] {
      Pipe.pipeThrough(poisoned, Seq("/bin/cat")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    // Without the feeder-error rethrow, cat would see clean EOF after
    // the partial feed, exit 0, and the task would SUCCEED with
    // truncated rows.
    assert(messages(ex).exists(_.contains("feed boom")), messages(ex).mkString(" | "))
  }

  test("user script ships to tasks via addFile/SparkFiles (DistributedCache contract)") {
    assume(binPresent("/bin/sh"))
    import spark.implicits._
    // A mapper the cluster nodes have never seen: only addFile can get
    // it to the tasks. sh reads it from the SparkFiles-local path.
    // The script lives in the pid-keyed scratch dir (cleaned at JVM
    // exit): an addFile registration is session-global and every
    // later task re-verifies the source, so deleting it mid-session
    // would fail every subsequent job — the same contract as Hadoop's
    // -file (the shipped artifact must outlive the job).
    val scratchDir = new java.io.File(graft.sources.FileRoundTrips.scratch("mapper", sfDir))
    scratchDir.mkdirs()
    val script = new java.io.File(scratchDir, "graft_mapper.sh")
    val w = new java.io.PrintWriter(script, "UTF-8")
    try w.println("""tr 'a-z' 'A-Z'""") finally w.close()
    val in = (0 until 200).map(i => s"row-$i")
    val piped = Pipe.pipeThroughScript(
      spark.createDataset(in).repartition(4), Seq("/bin/sh"), script).collect()
    assert(piped.sorted.toSeq == in.map(_.toUpperCase).sorted)
  }

  test("a command flooding stderr past the pipe buffer cannot deadlock the task") {
    assume(binPresent("/bin/sh"))
    import spark.implicits._
    // 256 KB of stderr BEFORE consuming stdin: without the drainer the
    // subprocess blocks on its stderr write while the feeder blocks on
    // the full stdin pipe — a permanent deadlock (PipeMapRed runs
    // MRErrorThread for this). With it, the round trip completes.
    val in = (0 until 5000).map(i => s"line-$i")
    val piped = Pipe.pipeThrough(
      spark.createDataset(in).repartition(2),
      Seq("/bin/sh", "-c",
        "head -c 262144 /dev/zero | tr '\\0' 'e' >&2; cat")).collect()
    assert(piped.sorted.toSeq == in.sorted)
  }

  test("nonzero exit surfaces the subprocess's stderr tail in the failure") {
    assume(binPresent("/bin/sh"))
    import spark.implicits._
    val ex = intercept[Exception] {
      Pipe.pipeThrough(
        spark.createDataset((0 until 10).map(_.toString)).repartition(1),
        Seq("/bin/sh", "-c", "echo 'mapper blew up: bad input' >&2; exit 7")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(m => m.contains("exited 7") && m.contains("mapper blew up")),
      messages(ex).mkString(" | "))
  }

  test("streaming_pipe_real equals the in-JVM stub over documents") {
    assume(binPresent("/bin/cat"))
    val real = Pipe.streamingPipeReal(spark, sfDir)
      .orderBy(col("doc_id")).collect().toSeq
    val stub = graft.operators.Aggregators.streamingPipe(spark, sfDir)
      .orderBy(col("doc_id")).collect().toSeq
    assert(real == stub)
  }
}
