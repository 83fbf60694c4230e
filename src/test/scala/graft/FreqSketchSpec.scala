package graft

import graft.functions.MisraGries
import graft.operators.Aggregators
import org.apache.spark.sql.functions._

import scala.util.Random

/** Misra–Gries frequent-items sketch + the two-pass heavy-hitters
  * operator (SURVEY §2.3 #39d). */
class FreqSketchSpec extends SparkSpecBase {

  /** Drive the Aggregator's own reduce/merge directly (no Spark)
    * over a random partitioning of a zipf-ish stream. */
  private def sketchOver(items: Seq[String], cap: Int, parts: Int, seed: Int): Seq[String] = {
    val mg = new MisraGries(cap)
    val rnd = new Random(seed)
    val partitioned = items.groupBy(_ => rnd.nextInt(parts)).values.toSeq
    val merged = partitioned
      .map(p => p.foldLeft(mg.zero)(mg.reduce))
      .foldLeft(mg.zero)(mg.merge)
    mg.finish(merged)
  }

  test("sketch_kmv_merge: merged-from-sketches equals sketch-of-all-data, estimate sane") {
    import graft.operators.Aggregators
    val rows = Aggregators.sketchKmvMerge(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getString(2), r.getDouble(3)))).toMap
    val all = rows("ALL")
    // the mergeable-summary law: the global k-min computed from ALL
    // distinct hashes must equal the 'ALL' row built from the
    // per-source kept sets only
    val hashes = Tables.documents(spark, sfDir).select("text").collect()
      .map(r => md5hex(r.getString(0))).distinct.sorted
    val k = Aggregators.KmvMergeK
    val globalKept = hashes.take(k)
    assert(all._1 == globalKept.length && all._2 == globalKept.last,
      s"merge law broken: $all vs ${globalKept.length}/${globalKept.last}")
    // estimate sanity: exact below k, within 50% above
    val trueDistinct = hashes.length
    if (trueDistinct < k) assert(all._3 == trueDistinct.toDouble)
    else assert(math.abs(all._3 - trueDistinct) / trueDistinct < 0.5,
      s"estimate ${all._3} vs true $trueDistinct")
    // per-source rows exist for every source
    assert(rows.size == 1 + Tables.documents(spark, sfDir)
      .select("source").distinct().count())
  }

  test("MG candidates are a superset of every item above N/(cap+1), any partitioning") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      // Zipf-ish: item i (of 100) drawn with weight 1/(i+1).
      val weights = (0 until 100).map(i => 1.0 / (i + 1))
      val cum = weights.scanLeft(0.0)(_ + _).tail
      val total = cum.last
      val items = Seq.fill(20000) {
        val x = rnd.nextDouble() * total
        s"item_${cum.indexWhere(x <= _)}"
      }
      val n = items.size
      val cap = 8 // far below the 100-item vocabulary: the sketch must actually evict
      val trueCounts = items.groupBy(identity).map { case (k, v) => k -> v.size }
      val mustSurvive = trueCounts.filter(_._2 > n / (cap + 1)).keySet
      assert(mustSurvive.nonEmpty, "seed produced no guaranteed heavy hitters")
      for (parts <- Seq(1, 3, 8)) {
        val cands = sketchOver(items, cap, parts, seed * 31 + parts).toSet
        assert(cands.size <= cap)
        assert(mustSurvive.subsetOf(cands),
          s"seed=$seed parts=$parts lost ${mustSurvive -- cands}")
      }
    }
  }

  test("heavy_hitters equals the naive exact φ-heavy set on the corpus") {
    import spark.implicits._
    val words = Tables.documents(spark, sfDir)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("word"))
    val n = words.count()
    val naive = words.groupBy("word").count()
      .where(col("count") * Aggregators.HhPhiDenom > n)
      .as[(String, Long)].collect().toMap
    val got = Aggregators.heavyHitterWords(spark, sfDir)
      .as[(String, Long)].collect().toMap
    assert(got == naive)
    // Non-trivial in both directions: some words qualify, some don't.
    assert(got.nonEmpty)
    assert(got.size < words.select("word").distinct().count())
  }

  test("streaming_heavy_hitters (two-batch incremental MG) equals the batch answer on the capped window") {
    import spark.implicits._
    val cap = graft.streaming.EventStreams.ReplayCap
    val words = Tables.documents(spark, sfDir)
      .filter(col("doc_id") < cap)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("word"))
    val n = words.count()
    val naive = words.groupBy("word").count()
      .where(col("count") * Aggregators.HhPhiDenom > n)
      .as[(String, Long)].collect().toMap
    val got = graft.streaming.EventStreams.heavyHittersStreamReplay(spark, sfDir)
      .as[(String, Long)].collect().toMap
    // The MG state merged across two real micro-batches is a superset
    // of the true φ-heavy set (mergeable-summaries guarantee), so the
    // exact confirm returns the batch answer exactly.
    assert(got == naive)
    assert(got.nonEmpty)
  }

  test("confirm pass rejects sketch near-misses: every emitted count clears the threshold") {
    import spark.implicits._
    val rows = Aggregators.heavyHitterWords(spark, sfDir).as[(String, Long)].collect()
    val n = Tables.documents(spark, sfDir)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w")).count()
    rows.foreach { case (w, c) =>
      assert(c * Aggregators.HhPhiDenom > n, s"$w emitted with sub-threshold count $c")
    }
  }

  test("sketch_cms: equals a naive JVM count-min replay; one-sided error law holds") {
    val rows = Aggregators.sketchCms(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // Naive reference: replay the d x w grid from the same md5
    // buckets driver-side.
    val users = Tables.events(spark, sfDir).select(col("user_id"))
      .collect().map(_.getLong(0))
    def bucket(r: Int, u: Long): Int =
      Integer.parseInt(md5hex(s"cms$r|$u").substring(0, 2), 16)
    val grid = Array.fill(Aggregators.CmsDepth, Aggregators.CmsWidth)(0L)
    users.foreach(u => (0 until Aggregators.CmsDepth)
      .foreach(r => grid(r)(bucket(r, u)) += 1))
    val exact = users.groupBy(identity).view.mapValues(_.length.toLong).toMap
    rows.foreach { case (u, nExact, nEst, overshoot) =>
      assert(nExact == exact(u))
      val expEst = (0 until Aggregators.CmsDepth).map(r => grid(r)(bucket(r, u))).min
      assert(nEst == expEst, s"user $u: est $nEst != naive $expEst")
      assert(overshoot == nEst - nExact && overshoot >= 0,
        s"CMS undercounted user $u") // est >= exact, always
    }
    assert(rows.map(_._1).distinct.length == exact.size, "every key estimated once")
  }
}
