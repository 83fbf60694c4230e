package graft.operators

import graft.Tables
import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Hadoop Streaming's external-process pipe with a REAL subprocess
  * (SURVEY §2.1 #19; reference contract:
  * hadoop-streaming `PipeMapper.java`/`PipeMapRed.java` — spawn the
  * user command once per task, write input records to its stdin,
  * read output records from its stdout, fail the task on a nonzero
  * exit).
  *
  * One subprocess per PARTITION (= per task, Hadoop's granularity).
  * A daemon feeder thread writes stdin while the task thread streams
  * stdout, so a command that buffers its whole input before emitting
  * (`sort`, `wc`) cannot deadlock the bounded OS pipe. Teardown
  * contract: stdin close signals EOF; once stdout drains the
  * iterator joins the feeder and checks the exit status; a
  * task-completion listener force-destroys the process if the task
  * dies early, so failed tasks leave no orphan processes.
  *
  * Scale shape: map-only — no shuffle, subprocess parallelism =
  * input partitions, records stream through bounded pipe buffers
  * (never materialized per task).
  */
object Pipe {

  /** Pipe a dataset of lines through `cmd`, one process per
    * partition. Output rows are the process's stdout lines. */
  def pipeThrough(lines: Dataset[String], cmd: Seq[String]): Dataset[String] = {
    import lines.sparkSession.implicits._
    lines.mapPartitions { it =>
      if (it.hasNext) new ProcessPipeIterator(cmd, it) else Iterator.empty
    }
  }

  /** Pipe through a USER script shipped to every task — Hadoop
    * Streaming's `-file mapper.py` contract (`StreamJob.java` packs
    * the script into DistributedCache; each task resolves a local
    * copy). Spark's analogue is `SparkContext.addFile` at plan time +
    * `SparkFiles.get` inside the partition: the file rides the
    * cluster's file server to every executor exactly once, so on a
    * 1000-executor cluster the script is fetched per executor, not
    * per task, and nothing but the file NAME rides the closure.
    * `interpreter` runs it without needing an exec bit
    * (e.g. `Seq("/bin/sh")`). The script file must OUTLIVE the
    * session: an addFile registration is session-global and later
    * tasks re-verify the source file, so deleting it mid-session
    * fails subsequent jobs (same lifetime contract as Hadoop's
    * `-file` artifacts). */
  def pipeThroughScript(lines: Dataset[String], interpreter: Seq[String],
      script: java.io.File, args: Seq[String] = Nil): Dataset[String] = {
    import lines.sparkSession.implicits._
    lines.sparkSession.sparkContext.addFile(script.getAbsolutePath)
    val name = script.getName
    lines.mapPartitions { it =>
      if (it.hasNext) {
        val local = org.apache.spark.SparkFiles.get(name)
        new ProcessPipeIterator((interpreter :+ local) ++ args, it)
      } else Iterator.empty
    }
  }

  /** #19 `streaming_pipe_real`: the stub query's semantics with a
    * real subprocess on the oracle-checked path — `id \t text` lines
    * round-trip through `/bin/cat` (POSIX; documents contain no
    * newlines/tabs, so line framing is exact) and token counts are
    * computed from the piped-BACK text. A dropped, reordered, or
    * mangled byte anywhere in the write→subprocess→read path breaks
    * the oracle hash. */
  def streamingPipeReal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lines = Tables.documents(s, dir)
      .select(concat(col("doc_id").cast("string"), lit("\t"), col("text")))
      .as[String]
    pipeThrough(lines, Seq("/bin/cat"))
      .select(split(col("value"), "\t", 2).as("kv"))
      .select(col("kv").getItem(0).cast("long").as("doc_id"),
        size(TextFunctions.tokens(col("kv").getItem(1))).as("piped_tokens"))
  }
}

/** The per-task pipe runner (see [[Pipe]] for the contract).
  * Constructed inside `mapPartitions`, so it lives entirely on the
  * executor; only `cmd` rides the closure. */
private[graft] final class ProcessPipeIterator(cmd: Seq[String], input: Iterator[String])
    extends Iterator[String] {

  import java.nio.charset.StandardCharsets.UTF_8

  private val proc = new ProcessBuilder(cmd: _*).start()

  // Belt for task death mid-stream (exception, kill, speculation):
  // without it a failed task leaves the subprocess orphaned.
  Option(org.apache.spark.TaskContext.get()).foreach(
    _.addTaskCompletionListener[Unit] { _ =>
      if (proc.isAlive) { proc.destroyForcibly(); () }
    })

  // A non-IO failure while PULLING the input iterator (fetch failure,
  // upstream codegen error) must fail the task, not silently truncate
  // the pipe: closing stdin on the way out would hand the command a
  // clean EOF and exit 0, so without rethrowing, a partial feed would
  // read as success (Spark's own PipedRDD records and rethrows its
  // stdin-writer exception for the same reason). Only IOException is
  // swallowed — broken pipe is legal (`head` closes stdin early) and
  // the exit-status check decides pass/fail, like Hadoop's PipeMapRed.
  // Caveat: the iterator is pulled off the task thread, where
  // TaskContext.get() is null — upstream operators that consult the
  // thread-local would throw here and surface via this rethrow.
  @volatile private var feedError: Throwable = null
  private val feeder = new Thread(() => {
    val w = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(proc.getOutputStream, UTF_8))
    try {
      try input.foreach { l => w.write(l); w.write('\n') }
      finally w.close()
    } catch {
      case _: java.io.IOException => ()
      case t: Throwable => feedError = t
    }
  }, "graft-pipe-feeder")
  feeder.setDaemon(true)
  feeder.start()

  // Stderr must be drained continuously: a command that writes more
  // than the OS pipe buffer (~64 KB) to an unread stderr blocks on
  // that write, stops consuming stdin, and deadlocks the task against
  // the feeder (Hadoop's PipeMapRed runs MRErrorThread for exactly
  // this). Drained in fixed-size char chunks into a bounded tail —
  // a readLine drain would buffer an entire newline-free flood before
  // truncating, so a multi-GB '\n'-less stream would OOM the task
  // instead of deadlocking it. Only the tail survives for the
  // failure message.
  private val StderrTailChars = 2000
  private val stderrTail = new java.lang.StringBuilder
  private val errDrainer = new Thread(() => {
    val r = new java.io.InputStreamReader(proc.getErrorStream, UTF_8)
    val buf = new Array[Char](8192)
    try {
      var n = r.read(buf)
      while (n >= 0) {
        stderrTail.synchronized {
          stderrTail.append(buf, 0, n)
          val over = stderrTail.length - StderrTailChars
          if (over > 0) stderrTail.delete(0, over)
        }
        n = r.read(buf)
      }
    } catch { case _: java.io.IOException => () }
  }, "graft-pipe-stderr")
  errDrainer.setDaemon(true)
  errDrainer.start()

  private val out = new java.io.BufferedReader(
    new java.io.InputStreamReader(proc.getInputStream, UTF_8))
  private var line: String = out.readLine()
  private var finished = false

  override def hasNext: Boolean = {
    if (line == null && !finished) finish()
    line != null
  }

  override def next(): String = {
    if (!hasNext) throw new NoSuchElementException("pipe drained")
    val l = line
    line = out.readLine()
    if (line == null) finish()
    l
  }

  private def finish(): Unit = {
    finished = true
    feeder.join()
    if (feedError != null)
      throw new IllegalStateException("pipe input feed failed", feedError)
    val rc = proc.waitFor()
    if (rc != 0) {
      errDrainer.join(2000)
      val err = stderrTail.synchronized {
        if (stderrTail.length == 0) ""
        else "; stderr tail: " + stderrTail.toString
          .takeRight(500).replace('\n', '|').trim
      }
      throw new IllegalStateException(
        s"pipe command '${cmd.mkString(" ")}' exited $rc$err")
    }
  }
}
