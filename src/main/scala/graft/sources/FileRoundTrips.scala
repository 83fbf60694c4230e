package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write-side MapReduce analogues surfaced as oracle-checked queries
  * (SURVEY §2.1 #14/#17): each writes through the real sink, reads
  * its own output back, and aggregates — a hash match against the
  * source-table oracle proves the sink+source preserved every row.
  *
  * Reference contracts: `lib/output/MultipleOutputs.java` (named
  * outputs with distinct schemas from one job) and SequenceFile/
  * compressed output (columnar zstd parquet is the successor).
  * Outputs land under java.io.tmpdir, keyed by the sf dir name so
  * concurrent scale factors don't collide.
  */
object FileRoundTrips {

  private def scratch(kind: String, dir: String): String = {
    val sf = new java.io.File(dir).getName
    // Keyed by pid as well as sf: two concurrent runs on the same
    // scale factor (Verify + Bench, or two checkouts) must not
    // overwrite each other's parquet mid-read.
    val pid = ProcessHandle.current().pid()
    s"${System.getProperty("java.io.tmpdir")}/graft_rt/p${pid}/${kind}_$sf"
  }

  /** #17 Compressed columnar round-trip: zstd parquet write → read →
    * aggregate. The parquet files ARE the check — corrupt encoding,
    * dropped rows, or lossy values would break the oracle hash. */
  def columnarRoundTrip(s: SparkSession, dir: String): DataFrame = {
    val out = scratch("zstd", dir)
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .write.mode("overwrite").option("compression", "zstd").parquet(out)
    s.read.parquet(out)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("sum_price"))
  }

  /** #14 Named MultipleOutputs round-trip: ONE persisted pass over
    * orders fans out into two differently-schema'd named outputs
    * (MultipleOutputs.write(name, ...) analogue); both are read back
    * and summarized per output name. */
  def namedOutputsRoundTrip(s: SparkSession, dir: String): DataFrame = {
    val base = scratch("named", dir)
    val src = Tables.orders(s, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      src.filter(col("o_totalprice") > 200000)
        .select(col("o_orderkey"), col("o_totalprice"))
        .write.mode("overwrite").parquet(s"$base/big")
      src.filter(col("o_totalprice") <= 200000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .write.mode("overwrite").parquet(s"$base/small")
      def summary(name: String): DataFrame =
        s.read.parquet(s"$base/$name")
          .agg(count(lit(1)).as("n_rows"),
            round(sum(col("o_totalprice")), 2).as("sum_price"))
          .select(lit(name).as("output_name"), col("n_rows"), col("sum_price"))
      summary("big").unionByName(summary("small"))
    } finally { src.unpersist(); () }
  }
}
