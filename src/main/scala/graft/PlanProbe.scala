package graft

/** Dev utility behind the PLANS.md review workflow: print the
  * formatted physical plan of each named registered query at
  * sf0.001 (`sbt 'runMain graft.PlanProbe q1 q2 …'`). Not part of
  * the driver contract — plan SHAPE assertions live in the specs;
  * this is the human-readable dump a plan-review session starts
  * from. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for (n <- args) {
      println(s"===== $n =====")
      SparkEntry.queries(n)(s, dir).explain("formatted")
    }
    s.stop()
  }
}
