package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §2.1 #18 — the `lib/db` DBInputFormat/DBOutputFormat
  * analogue (reference contract:
  * `hadoop-mapreduce-client-core/src/main/java/org/apache/hadoop/
  * mapreduce/lib/db/{DBInputFormat,DBOutputFormat}.java`, public
  * Hadoop 2.10.0 tree).
  *
  * Spark-first re-expression: `DataFrameWriter.jdbc` is the
  * DBOutputFormat (batched INSERTs per partition) and
  * `spark.read.format("jdbc")` with `partitionColumn` /
  * `lowerBound` / `upperBound` / `numPartitions` is DBInputFormat's
  * split-by-bounding-query contract — each executor issues its own
  * `WHERE partitionColumn BETWEEN lo AND hi` range scan, which is
  * exactly how DBInputFormat carved InputSplits.
  *
  * The database here is Derby embedded in-memory (ships with Spark's
  * jars; zero-egress container) — a stand-in for a network RDBMS
  * endpoint. Embedded-memory scope is the one *local-mode-only*
  * assumption in this file: on a real cluster the URL must point at a
  * server all executors can reach; everything else (bounded writes,
  * partitioned range reads) is the production shape.
  */
object DbExchange {

  private val Driver = "org.apache.derby.jdbc.EmbeddedDriver"
  private val Url = "jdbc:derby:memory:graftdb;create=true"

  private def props: java.util.Properties = {
    val p = new java.util.Properties()
    p.setProperty("driver", Driver)
    p
  }

  /** #18 DB round-trip: supplier → JDBC sink → partitioned JDBC
    * source → aggregate. The oracle runs the same aggregate on the
    * parquet table directly, so a hash match proves the sink+source
    * preserved every row, numeric value, and string exactly. */
  def dbRoundTrip(s: SparkSession, dir: String): DataFrame = {
    // Keep Derby's log out of the repo cwd.
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    val src = Tables.supplier(s, dir)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"), col("s_acctbal"))
    src.write.mode(SaveMode.Overwrite).jdbc(Url, "graft_supplier", props)
    val back = s.read.format("jdbc")
      .option("url", Url)
      .option("driver", Driver)
      .option("dbtable", "graft_supplier")
      // DBInputFormat-style splits: 4 executor-side range scans on the
      // key. Bounds define the stride, not a filter — out-of-range
      // rows land in the first/last partition, so no rows are lost.
      .option("partitionColumn", "s_suppkey")
      .option("lowerBound", "0")
      .option("upperBound", "100000")
      .option("numPartitions", "4")
      .load()
    back.groupBy(col("s_nationkey"))
      .agg(
        count(lit(1)).as("n_suppliers"),
        round(sum(col("s_acctbal")), 2).as("total_bal"),
        min(col("s_name")).as("first_name"))
  }
}
