package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._

/** Explicit GROUPING SETS (§2 #34c) and ntile bucketing (§2 #35b). */
class GroupingWindowSpec extends SparkSpecBase {

  test("grouping_sets_report plans one Expand pass and gid separates set levels") {
    val df = Analytics.groupingSetsReport(spark, sfDir)
    val plan = explainString(df)
    // All three sets come out of ONE Expand + one aggregation — not
    // a union of three scans.
    assert(plan.contains("Expand"), plan.take(2000))
    // Tree-form nodes only ("Scan parquet  (n)") — the details
    // section repeats each node as "(n) Scan parquet".
    assert("""Scan parquet\s+\(\d+\)""".r.findAllIn(plan).size == 1,
      plan.take(2000))
    val rows = df.collect()
    val byGid = rows.groupBy(_.getInt(2))
    // gid 0 = (flag, status); 2 = flag rolled up; 3 = grand total.
    assert(byGid.keySet == Set(0, 2, 3), byGid.keySet.toString)
    assert(byGid(3).length == 1)
    val total = byGid(3).head.getLong(3)
    // Each level partitions the same rows: counts re-sum to the total.
    assert(byGid(0).map(_.getLong(3)).sum == total)
    assert(byGid(2).map(_.getLong(3)).sum == total)
    // gid distinguishes rolled-up columns from NULL data values: the
    // flag column is NULL exactly on the gid 2 and 3 rows.
    rows.foreach { r =>
      assert(r.isNullAt(0) == (r.getInt(2) >= 2), r.toString)
    }
  }

  test("events_ema equals a naive per-user truncated-EMA replay") {
    val evs = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val naive = evs.groupBy(_._1).iterator.flatMap { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._2))
      ordered.zipWithIndex.map { case ((_, eid, _, _), i) =>
        val lags = Analytics.EmaLags
        // weights 2^(lags-1-k): exact double scalings, fixed add order
        var num = 0.0; var den = 0L
        for (k <- 0 until math.min(lags, i + 1)) {
          val wgt = 1 << (lags - 1 - k)
          num += ordered(i - k)._4 * wgt
          den += wgt
        }
        eid -> BigDecimal(num / den)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }.toMap
    val got = Analytics.eventsEma(spark, sfDir).collect()
      .map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(got.keySet == naive.keySet)
    val diffs = got.count { case (k, v) => v != naive(k) }
    assert(diffs == 0, s"$diffs of ${got.size} EMA values diverge from the naive replay")
    // partition starts exercise the renormalization branch
    assert(evs.groupBy(_._1).exists(_._2.length >= Analytics.EmaLags),
      "need at least one user with a full window")
  }

  test("window_ntile buckets are equal-frequency within one row per group") {
    val rows = Analytics.windowNtile(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(4), r.getDouble(5)))
    val byPrio = rows.groupBy(_._1)
    byPrio.foreach { case (prio, qs) =>
      assert(qs.map(_._2).sorted.toSeq == (1 to 4), s"$prio quartiles")
      val sizes = qs.map(_._3)
      assert(sizes.max - sizes.min <= 1, s"$prio sizes ${sizes.mkString(",")}")
      // Value bands are ordered: each quartile's hi <= the next's lo
      // (ties can share a boundary value across adjacent buckets).
      val ordered = qs.sortBy(_._2)
      ordered.sliding(2).foreach { case Array(a, b) =>
        assert(a._5 <= b._4, s"$prio bands overlap: $a vs $b")
      }
    }
  }
}
