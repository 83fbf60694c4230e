package graft
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (n <- args) {
      println(s"===== $n =====")
      SparkEntry.queries(n)(s, dir).explain("formatted")
    }
    s.stop()
  }
}
