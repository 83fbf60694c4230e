package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-19 measurement probe for the scaling-curve ledger: WHY does
  * `dedup_embedding_lsh` scale ~48× for 10× data (BENCH_scale_r19
  * extension) when it is the family's designated bucketed scale path?
  *
  * Hypothesis under test: the SRP band space is FIXED —
  * [[graft.operators.Dedup.EmbBands]] bands × 2^[[graft.operators.Dedup.EmbPlanes]]
  * buckets (8 × 64) — so bucket occupancy grows linearly with the
  * corpus and the band self-join's candidate volume
  * Σ_{band,bucket} C(occ, 2) grows QUADRATICALLY. This probe prints
  * that sum (exact candidate-pair volume before dedup/verify), the
  * occupancy histogram's max/mean, and the verified-output size, per
  * SF dir given on the command line. Run:
  * `sbt 'Test/runMain graft.SrpOccupancyProbe /root/testdata/sf0.1 /root/scratch/sf1'`. */
object SrpOccupancyProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-srp-occupancy-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftFunctions.register(spark)
    for (dir <- args) {
      val e = Tables.embeddings(spark, dir)
      // Round 20: planes are corpus-derived (embPlanes), so the probe
      // reports the band space the query would actually use per dir.
      val planes = graft.operators.Dedup.embPlanes(spark, dir)
      val banded = e.select(col("vec_id"),
        posexplode(graft.plans.GraftFunctions.srp_band_sigs(col("embedding"),
          graft.operators.Dedup.EmbBands, planes))
          .as(Seq("band", "bucket")))
      val occ = banded.groupBy(col("band"), col("bucket"))
        .agg(count(lit(1)).as("occ"))
      val stats = occ.agg(
        sum(col("occ") * (col("occ") - 1) / 2).as("cand_pairs"),
        max(col("occ")).as("max_occ"),
        avg(col("occ")).as("mean_occ"),
        count(lit(1)).as("nonempty_buckets")).collect()(0)
      val n = e.count()
      println(s"$dir: n_vectors=$n cand_pairs=${stats.get(0)} " +
        s"max_occ=${stats.get(1)} mean_occ=${stats.get(2)} " +
        s"nonempty_buckets=${stats.get(3)} " +
        s"(band space = ${graft.operators.Dedup.EmbBands} x " +
        s"${1 << planes})")
    }
    spark.stop()
  }
}
