package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-20 measurement probe for the scaling-curve ledger (r19
  * verdict #2): WHERE does `dedup_semdedup`'s fixed k cross over?
  *
  * SemDeDup's quadratic stage is the within-cluster pair join —
  * candidate volume Σ_cluster C(occ, 2) ≈ n²/(2k) in expectation —
  * and with k FIXED at [[graft.operators.Similarity.NumCentroids]]
  * (16) that volume grows quadratically with the corpus, the same
  * fixed-space disease SrpOccupancyProbe measured for the SRP band
  * space in round 19. This probe prints, per SF dir given on the
  * command line and per plane of the fix (k = 16 vs the
  * corpus-derived [[graft.operators.Dedup.semK]]), the exact
  * within-cluster pair volume, occupancy max/mean, and the Lloyd
  * work n·k·(NumLloyd+1) — so the crossover ledger shows both sides
  * of the k trade (pair stage shrinks as 1/k, assignment work grows
  * as k; k ∝ √n balances them at Θ(n^1.5), the optimum available
  * while the exact-DECIMAL Lloyd contract holds). Run:
  * `sbt 'Test/runMain graft.SemOccupancyProbe /root/testdata/sf0.1 /root/scratch/sf1 ...'`. */
object SemOccupancyProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-sem-occupancy-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftFunctions.register(spark)
    for (dir <- args) {
      val eD = graft.operators.Similarity.embD(spark, dir)
      val n = eD.count()
      val derived = graft.operators.Dedup.semK(spark, dir)
      val ks = Seq(graft.operators.Similarity.NumCentroids, derived).distinct
      for (k <- ks) {
        val t0 = System.nanoTime()
        val cents = graft.operators.Similarity.lloydCentroids(eD, k)
        val assigned =
          if (k <= graft.operators.Similarity.BroadcastAssignK)
            eD.select(array_max(graft.operators.Similarity.scored(cents))
              .getField("c_id").as("cluster"))
          else
            graft.operators.Similarity.assignBroadcast(spark, eD, cents)
              .select(col("cluster"))
        val occ = assigned.groupBy(col("cluster")).agg(count(lit(1)).as("occ"))
        val stats = occ.agg(
          sum(col("occ") * (col("occ") - 1) / 2).as("cand_pairs"),
          max(col("occ")).as("max_occ"),
          avg(col("occ")).as("mean_occ"),
          count(lit(1)).as("nonempty")).collect()(0)
        val secs = (System.nanoTime() - t0) / 1e9
        println(s"$dir: n=$n k=$k${if (k == derived && k != graft.operators.Similarity.NumCentroids) " (derived)" else ""} " +
          s"cand_pairs=${stats.get(0)} max_occ=${stats.get(1)} " +
          s"mean_occ=${stats.get(2)} nonempty_clusters=${stats.get(3)} " +
          s"lloyd_work=${n * k * (graft.operators.Similarity.NumLloyd + 1)} " +
          s"assign_probe_secs=${f"$secs%.1f"}")
      }
    }
    spark.stop()
  }
}
