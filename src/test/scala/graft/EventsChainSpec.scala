package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._

/** Funnel + cohort retention (SURVEY §2 #37c/#37d): semantics vs
  * naive driver-side references at sf0.001, plus the structural
  * invariants each report must satisfy (monotone funnel counts;
  * offset-0 cohort completeness). */
class EventsChainSpec extends SparkSpecBase {

  private def eventRows() = Tables.events(spark, sfDir)
    .select("user_id", "event_type", "ts").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime))

  test("events_funnel counts strictly-ordered view->click->purchase progressions") {
    val got = Analytics.eventsFunnel(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ev = eventRows()
    val byUser = ev.groupBy(_._1)
    var (n1, n2, n3) = (0L, 0L, 0L)
    byUser.foreach { case (_, rows) =>
      val views = rows.filter(_._2 == "view").map(_._3)
      if (views.nonEmpty) {
        n1 += 1
        val t1 = views.min
        val clicks = rows.filter(r => r._2 == "click" && r._3 > t1).map(_._3)
        if (clicks.nonEmpty) {
          n2 += 1
          val t2 = clicks.min
          if (rows.exists(r => r._2 == "purchase" && r._3 > t2)) n3 += 1
        }
      }
    }
    assert(got == Map("1_view" -> n1, "2_click" -> n2, "3_purchase" -> n3),
      s"got $got expect ${(n1, n2, n3)}")
    // A funnel can only narrow.
    assert(got("1_view") >= got("2_click") && got("2_click") >= got("3_purchase"))
    assert(got("3_purchase") > 0, "sf0.001 should complete the funnel at least once")
  }

  test("events_retention builds the cohort triangle with exact week offsets") {
    val rows = Analytics.eventsRetention(spark, sfDir).collect()
      .map(r => (r.getTimestamp(0).getTime, r.getInt(1)) -> r.getLong(2)).toMap
    assert(rows.nonEmpty)
    // Naive reference: truncate to Monday-start weeks driver-side.
    val weekMs = 7L * 24 * 3600 * 1000
    // 1970-01-01 is a Thursday; Monday epoch starts at -3 days.
    def weekStart(t: Long): Long = {
      val shifted = t + 3L * 24 * 3600 * 1000
      (shifted - Math.floorMod(shifted, weekMs)) - 3L * 24 * 3600 * 1000
    }
    val act = eventRows().map(r => (r._1, weekStart(r._3))).distinct
    val cohort = act.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val expect = act
      .map { case (u, wk) => (cohort(u), ((wk - cohort(u)) / weekMs).toInt, u) }
      .distinct
      .groupBy(t => (t._1, t._2)).view.mapValues(_.length.toLong).toMap
    assert(rows == expect,
      s"missing=${expect.keySet -- rows.keySet} extra=${rows.keySet -- expect.keySet}")
    // Offset 0 covers every cohort's full population: each user is
    // active in their own first week by construction.
    val cohortSizes = cohort.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    cohortSizes.foreach { case (wk, n) =>
      assert(rows((wk, 0)) == n, s"cohort $wk offset 0 should count all $n users")
    }
  }
}
