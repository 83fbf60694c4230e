package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan inspector: prints the formatted physical plan of one
  * SparkEntry query (after execution, so AQE's final plan is shown).
  * Usage: runMain graft.tools.PlanDebug <queryName> [sfDir]
  */
object PlanDebug {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.count()
    println(s"==== $name ====")
    df.explain("formatted")
    spark.stop()
  }
}
