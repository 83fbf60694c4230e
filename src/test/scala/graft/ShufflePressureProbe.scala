package graft

import org.apache.spark.sql.SparkSession

/** Round-20 measurement probe (r19 verdict #4): is `itemsim_cf`'s
  * residual over-linear scaling (11.7× at 10× data, 32 g heap,
  * round-19 closed watch) really per-partition pressure from the
  * fixed shuffle-partition count (32 = local cpus while data grew
  * 10×), i.e. resolved by the partition count growing with the
  * cluster exactly as the driver's own core-count contract scales
  * it — or an operator defect?
  *
  * Three arms over the same query/data/heap, timed cold-cache like
  * Bench (clearCaches between reps, noop sink):
  *   fixed-N     — `spark.sql.shuffle.partitions = N` (the bench
  *                 contract value; N = cpus reproduces the watch),
  *   scaled-N    — partitions grown ∝ data (what a real cluster
  *                 does; proves or disproves the pressure claim),
  *   aqe-initial — partitions = cpus but
  *                 `adaptive.coalescePartitions.initialPartitionNum`
  *                 scaled ∝ data (AQE picks the effective count from
  *                 bytes; the config a deployment would actually
  *                 ship, guide §2.2).
  * One arm per JVM (pass one spec per run: partition counts are
  * session-wide and a shared JVM would cross-warm the JIT between
  * arms). Run:
  * `sbt 'Test/runMain graft.ShufflePressureProbe <query> <dir> <parts> <reps> [initialPartitionNum]'`. */
object ShufflePressureProbe {
  def main(args: Array[String]): Unit = {
    val Seq(query, dir, partsS, repsS, rest @ _*) = args.toSeq: @unchecked
    val parts = partsS.toInt
    val reps = repsS.toInt
    val initial = rest.headOption.map(_.toInt)
    val b = SparkSession.builder()
      .master("local[32]")
      .appName(s"graft-shuffle-pressure-$query-p$parts")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    initial.foreach { n =>
      b.config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", n)
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(query)
    val times = (1 to reps).map { _ =>
      graft.operators.Dedup.clearCaches()
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val sorted = times.sorted
    println(s"$query dir=$dir parts=$parts" +
      initial.map(n => s" initialPartitionNum=$n").getOrElse("") +
      s" reps=${times.map(t => f"$t%.2f").mkString(",")}" +
      f" median=${sorted(sorted.length / 2)}%.2f min=${sorted.head}%.2f")
    spark.stop()
  }
}
