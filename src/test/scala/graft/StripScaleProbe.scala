package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured answer to the round-15 PLANS.md open item: the strip
  * family's `array_except` complement rewrite was a WASH at the
  * synthetic corpus's ~300-char docs, and the claimed win at real
  * document sizes was only a worked example. This probe PLANTS the
  * deployment shape — docs of ~100 KB (2,000 lines of 50 chars),
  * half of each doc's lines duplicated corpus-wide so |cov| ≈ 1,000
  * per doc — and times the kept-lines rewrite both ways over the
  * identical duplicate profile:
  *
  *   old: filter(positions, NOT array_contains(dup_nos, i))  O(n·|cov|)
  *   new: array_except(positions, dup_nos)                   O(n+|cov|)
  *
  * Run: `sbt 'Test/runMain graft.StripScaleProbe [nDocs] [nLines]'`.
  * Both variants md5 the kept text so neither can dead-code away, and
  * the probe asserts identical kept counts/hashes before printing
  * timings (medians of 5 reps, cache-free — the inputs rebuild per
  * rep). Numbers land in PLANS.md ("Strip rewrites" round-16 update).
  */
object StripScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val nDocs = if (args.length > 0) args(0).toInt else 64
    val nLines = if (args.length > 1) args(1).toInt else 2000

    // ~100 KB docs: nLines lines of ~50 chars. Even line numbers get a
    // corpus-wide boilerplate line (duplicated in every doc — the
    // header/footer class); odd lines are doc-unique.
    def mkDoc(d: Long): String =
      (0 until nLines).map { i =>
        if (i % 2 == 0) f"boilerplate-nav-header-line-$i%06d-shared-by-all-docs"
        else f"doc$d%04d-unique-content-line-$i%06d-${i * 2654435761L}%x"
      }.mkString("\n")
    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
      udf(mkDoc _).apply(col("id")).as("text"))
      .repartition(8)

    val lines = docs
      .select(col("doc_id"), posexplode(split(col("text"), "\n", -1))
        .as(Seq("line_no", "line")))
      .filter(length(col("line")) > 0)
      .select(col("doc_id"), col("line_no").cast("int").as("line_no"),
        md5(col("line")).as("h"))
    val freq = lines.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val dup = lines.join(freq, "h").filter(col("df") >= 2)
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("line_no"))).as("dup_nos"))
    val noDups = array().cast("array<int>")
    val base = docs.join(dup, Seq("doc_id"), "left")
      .withColumn("ls", split(col("text"), "\n", -1))

    def tally(withKeep: DataFrame): (Long, Long) = {
      val r = withKeep
        .select(col("doc_id"), size(col("keep")).as("n_kept"),
          md5(array_join(col("keep"), "\n")).as("kept_md5"))
        .agg(sum(col("n_kept")), count(lit(1))).collect().head
      (r.getLong(0), r.getLong(1))
    }
    val positions = when(size(col("ls")) >= 1,
      sequence(lit(0), size(col("ls")) - 1)).otherwise(noDups)
    def newKeep = base.withColumn("keep",
      transform(array_except(positions, coalesce(col("dup_nos"), noDups)),
        i => element_at(col("ls"), i + 1)))
    def oldKeep = base.withColumn("keep",
      transform(filter(positions,
          i => !array_contains(coalesce(col("dup_nos"), noDups), i)),
        i => element_at(col("ls"), i + 1)))

    // correctness cross-check before timing anything
    require(tally(newKeep) == tally(oldKeep), "variants disagree")

    def medianOf(reps: Int)(body: => Unit): Double = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(reps / 2)
    }
    // alternate (interleaved pairs, the house A/B rule)
    val newT = Array.newBuilder[Double]
    val oldT = Array.newBuilder[Double]
    for (_ <- 1 to 5) {
      oldT += medianOf(1)(tally(oldKeep))
      newT += medianOf(1)(tally(newKeep))
    }
    def fmt(a: Array[Double]) = a.map(t => f"$t%.2f").mkString("/")
    println(s"docs=$nDocs lines/doc=$nLines (~${nLines * 50 / 1024} KB/doc), " +
      s"|cov|/doc=${nLines / 2}")
    println(s"old array_contains reps: ${fmt(oldT.result())} s")
    println(s"new array_except reps:   ${fmt(newT.result())} s")
    spark.stop()
  }
}
