package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: JVM/codegen spin-up and parquet footer reads
    // otherwise land entirely on whichever query happens to run first.
    spark.range(1000).selectExpr("sum(id)").collect()
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: materializes every output column (count() would let
      // Catalyst prune computed columns and under-report the work)
      val err = try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
        catch { case t: Throwable =>
          Some(Option(t.getMessage).getOrElse(t.getClass.getName)
            .replaceAll("[\"\\\\\\n\\r\\t]", " ").take(200))
        }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    graft.operators.Dedup.clearCaches()
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"\"$k\":\"$e\"" }
      .mkString("{", ",", "}")
    // A failed query must not silently improve the total: errors are
    // reported per query and the run exits nonzero if any exist.
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
    if (results.exists(_._3.isDefined)) sys.exit(1)
  }
}
