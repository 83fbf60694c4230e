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

  test("scd2_dimension: contiguous non-overlapping ranges, one current row, no no-op versions") {
    val rows = Analytics.scd2Dimension(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (user, vs) =>
      val hist = vs.sortBy(_._3)
      // exactly one open (current) version per user — the last one
      assert(hist.count(_._5) == 1, s"user $user current-count")
      assert(hist.last._5 && hist.last._4.isEmpty, s"user $user open tail")
      // ranges contiguous: each version closes exactly where the next opens
      hist.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3), s"user $user gap/overlap at ${b._3}")
        case _ => ()
      }
      // change detection: consecutive versions never carry equal values
      hist.sliding(2).foreach {
        case Array(a, b) => assert(a._2 != b._2, s"user $user no-op version kept")
        case _ => ()
      }
    }
    // retained versions = real changes of the purchase stream
    val purchases = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getDouble(3)))
    val expected = purchases.groupBy(_._1).map { case (u, es) =>
      val vals = es.sortBy(e => (e._2, e._3)).map(_._4)
      u -> (1 + vals.sliding(2).count {
        case Array(a, b) => a != b
        case _ => false
      })
    }
    assert(rows.groupBy(_._1).view.mapValues(_.length).toMap == expected)
  }

  test("winsorize_values: ~1% clipped per tail, clipped sum within threshold bounds") {
    val got = Analytics.winsorizeValues(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val vals = Tables.events(spark, sfDir)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    got.foreach { case (typ, (n, lo, hi, sumClipped)) =>
      val vs = vals.filter(_._1 == typ).map(_._2)
      assert(n == vs.length.toLong)
      // exact percentile at p=0.01/0.99 clips at most ~1% + 1 per tail
      val cap = math.ceil(vs.length * 0.011).toLong + 1
      assert(lo <= cap && hi <= cap, s"$typ clipped $lo/$hi of ${vs.length}")
      // naive reference: interpolated percentile (Spark's percentile
      // semantics), rounded(4) thresholds, clip, decimal sum
      val sorted = vs.sorted
      def pct(q: Double): Double = {
        val pos = (sorted.length - 1) * q
        val i = pos.toInt
        val frac = pos - i
        if (i + 1 < sorted.length) sorted(i) * (1 - frac) + sorted(i + 1) * frac
        else sorted(i)
      }
      def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (pLo, pHi) = (r4(pct(0.01)), r4(pct(0.99)))
      assert(lo == vs.count(_ < pLo).toLong && hi == vs.count(_ > pHi).toLong,
        s"$typ clip counts")
      val expSum = vs.map(v => BigDecimal(math.min(math.max(v, pLo), pHi))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
      val expRounded = expSum.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(sumClipped - expRounded) < 1e-9, s"$typ sum $sumClipped vs $expRounded")
    }
    assert(got.values.map(_._2).sum > 0 && got.values.map(_._3).sum > 0)
  }

  test("grouped_regression: matches a naive double-precision OLS, r2 in range") {
    val got = Analytics.groupedRegression(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val events = Tables.events(spark, sfDir)
      .select("event_type", "ts", "value").collect()
      .map(r => (r.getString(0),
        r.getTimestamp(1).toLocalDateTime.toLocalDate.toEpochDay -
          java.time.LocalDate.parse("2024-01-01").toEpochDay,
        r.getDouble(2)))
    assert(got.values.map(_._1).sum == events.length.toLong)
    events.groupBy(_._1).foreach { case (typ, es) =>
      val n = es.length.toDouble
      val xs = es.map(_._2.toDouble); val ys = es.map(_._3)
      val sx = xs.sum; val sy = ys.sum
      val sxx = xs.map(x => x * x).sum
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val intercept = (sy - slope * sx) / n
      val (gn, gs, gi, gr2) = got(typ)
      assert(gn == es.length.toLong)
      // naive FP sums vs the exact-decimal path: agree to ~1e-6
      assert(math.abs(gs - slope) < 1e-4, s"$typ slope $gs vs $slope")
      assert(math.abs(gi - intercept) < 1e-3, s"$typ intercept $gi vs $intercept")
      assert(gr2 >= 0 && gr2 <= 1, s"$typ r2 $gr2")
    }
  }

  test("scd2_incremental: equals the full rebuild; untouched users byte-identical") {
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val incr = Analytics.scd2Incremental(spark, sfDir)
    val full = Analytics.scd2Dimension(spark, sfDir)
    assert(key(incr) == key(full))
    // the split is real: both stored-era and batch-era versions exist
    val cutMs = java.sql.Timestamp.valueOf(Analytics.Scd2Cutoff).getTime
    val froms = incr.collect().map(_.getLong(2))
    assert(froms.exists(_ < cutMs) && froms.exists(_ >= cutMs),
      "cutoff did not split the history")
    // exactly one open version per user
    val rows = incr.collect().map(r => (r.getLong(0), r.getBoolean(4)))
    rows.groupBy(_._1).foreach { case (u, vs) =>
      assert(vs.count(_._2) == 1, s"user $u open-version count")
    }
  }

  test("join_pointintime: each fact carries the version in force at its timestamp") {
    val got = Analytics.joinPointInTime(spark, sfDir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    val events = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3).getTime, r.getDouble(4)))
    // naive reference: retained purchase versions per user, then a
    // per-event linear as-of lookup (inclusive at the change instant)
    val versions = events.filter(_._3 == "purchase")
      .groupBy(_._2).view.mapValues { es =>
      val ordered = es.sortBy(e => (e._4, e._1)).map(e => (e._4, e._5))
      ordered.foldLeft(Vector.empty[(Long, Double)]) {
        case (acc, (t, v)) =>
          if (acc.nonEmpty && acc.last._2 == v) acc else acc :+ ((t, v))
      }
    }.toMap
    assert(got.size == events.length)
    events.foreach { case (id, user, typ, ts, _) =>
      val expected = versions.getOrElse(user, Vector.empty)
        .filter(_._1 <= ts).lastOption.map(_._2)
      assert(got(id) == ((user, typ, ts, expected)), s"event $id")
    }
    // both branches real: some facts precede any version, most don't
    assert(got.values.exists(_._4.isEmpty) && got.values.exists(_._4.nonEmpty))
    // a purchase that creates a version must see ITS OWN value
    val changed = events.filter(_._3 == "purchase").filter { case (id, user, _, ts, v) =>
      versions(user).exists(p => p._1 == ts && p._2 == v)
    }
    assert(changed.nonEmpty)
    changed.foreach { case (id, _, _, _, v) =>
      assert(got(id)._4.contains(v), s"purchase $id sees stale version")
    }
  }

  test("events_gapfill: contiguous daily grid, forward-filled values, one-exchange plan") {
    val df = Analytics.eventsGapfill(spark, sfDir)
    // scale posture: the repartition(user_id) is the ONLY exchange —
    // the (user_id, day) agg and the user_id window both reuse it
    val plan = explainString(df)
    // formatted explain shows each node once in the tree and once in
    // the details — count numbered detail headers only
    assert("\\(\\d+\\) Exchange\\b".r.findAllIn(plan).length == 1, plan.take(2000))
    val rows = df.collect()
      .map(r => (r.getLong(0),
        java.time.LocalDate.parse(r.getString(1)).toEpochDay,
        r.getDouble(2), r.getBoolean(3)))
    val observed = Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getLong(0),
        r.getTimestamp(1).toLocalDateTime.toLocalDate.toEpochDay,
        (r.getTimestamp(1).getTime, r.getLong(2)), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (user, ds) =>
      val grid = ds.map(_._2).sorted
      // contiguous: every day from first to last observed, exactly once
      assert(grid.distinct.length == grid.length, s"user $user dup days")
      assert(grid.last - grid.head == grid.length - 1,
        s"user $user grid not contiguous")
      val obs = observed.filter(_._1 == user)
      assert(grid.head == obs.map(_._2).min && grid.last == obs.map(_._2).max)
      // forward fill: each grid day carries the max-(ts,event_id)
      // value of the latest observed day <= it
      val lastPerDay = obs.groupBy(_._2).view.mapValues(_.maxBy(_._3)._4).toMap
      ds.foreach { case (_, day, filled, isObs) =>
        val prevObs = obs.map(_._2).filter(_ <= day).max
        assert(filled == lastPerDay(prevObs), s"user $user day $day fill")
        assert(isObs == lastPerDay.contains(day), s"user $user day $day observed flag")
      }
    }
  }

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

  test("events_funnel_time: deltas equal a naive step replay; percentiles interpolate exactly") {
    def interp(xs: Seq[Long], p: Double): Double = {
      val s = xs.sorted.map(_.toDouble); val pos = (s.length - 1) * p
      val lo = pos.toInt
      if (lo == pos) s(lo) else s(lo) + (pos - lo) * (s(lo + 1) - s(lo))
    }
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val evs = Tables.events(spark, sfDir)
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
    // full-microsecond instants for step comparisons; the reported
    // delta is unix_millis semantics (= Timestamp.getTime)
    def us(t: java.sql.Timestamp) = t.getTime * 1000L + t.getNanos % 1000000 / 1000
    val byUser = evs.groupBy(_._1)
    val deltas = byUser.values.flatMap { es =>
      val t1 = es.filter(_._2 == "view").map(e => us(e._3)).minOption
      val t2 = t1.flatMap(a =>
        es.filter(e => e._2 == "click" && us(e._3) > a).map(e => us(e._3)).minOption)
      val t3 = t2.flatMap(b =>
        es.filter(e => e._2 == "purchase" && us(e._3) > b).map(e => us(e._3)).minOption)
      (t1, t3) match {
        case (Some(a), Some(c)) =>
          Some(Math.floorDiv(c, 1000L) - Math.floorDiv(a, 1000L))
        case _ => None
      }
    }.toSeq
    val r = Analytics.eventsFunnelTime(spark, sfDir).collect()(0)
    assert(r.getLong(0) == deltas.length.toLong, "n_converted")
    assert(deltas.nonEmpty, "degenerate: nobody converts at this SF")
    assert(r.getLong(1) == deltas.min && r.getLong(4) == deltas.max)
    assert(r.getDouble(2) == r4(interp(deltas, 0.5)), "p50")
    assert(r.getDouble(3) == r4(interp(deltas, 0.9)), "p90")
    assert(deltas.forall(_ > 0), "conversion strictly after first view")
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

  test("events_transitions: row-stochastic matrix, pair mass = events - users") {
    val rows = Analytics.eventsTransitions(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
    assert(rows.nonEmpty)
    // each from-row's probabilities sum to ~1 (round-4 per cell)
    rows.groupBy(_._1._1).foreach { case (from, cells) =>
      val p = cells.map(_._2._2).sum
      assert(math.abs(p - 1.0) < 1e-3, s"$from prob mass $p")
    }
    // total pair count = sum over users of (n_events - 1)
    val perUser = Tables.events(spark, sfDir).groupBy("user_id").count()
      .collect().map(_.getLong(1))
    val expectedPairs = perUser.map(n => math.max(0L, n - 1)).sum
    assert(rows.map(_._2._1).sum == expectedPairs)
    // exact vs naive adjacent pairs under the (ts, event_id) order
    val naive = Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1).values.flatMap { evs =>
        evs.sortBy(e => (e._2.getTime, e._2.getNanos, e._3))
          .map(_._4).sliding(2).filter(_.length == 2).map(p => (p(0), p(1)))
      }.toSeq.groupBy(x => x).view.mapValues(_.size.toLong).toMap
    assert(rows.map(t => t._1 -> t._2._1).toMap == naive)
  }

  test("ab_test: hash-balanced arms, z matches a naive Welch computation") {
    val got = Analytics.abTest(spark, sfDir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    assert(got.nonEmpty)
    val ev = Tables.events(spark, sfDir)
      .select("event_type", "user_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    def arm(uid: Long): Long =
      java.lang.Long.parseLong(md5hex(s"ab|$uid").take(4), 16) % 2
    got.foreach { case (et, (na, nb, ma, mb, z)) =>
      val vals = ev.filter(_._1 == et)
      val a = vals.filter(v => arm(v._2) == 0).map(_._3)
      val b = vals.filter(v => arm(v._2) == 1).map(_._3)
      assert(na == a.length.toLong && nb == b.length.toLong, s"$et arm sizes")
      // arms are roughly balanced (hash parity over ~dozens of users)
      assert(na > 0 && nb > 0, s"$et empty arm")
      val meanA = a.sum / a.length; val meanB = b.sum / b.length
      assert(math.abs(ma - meanA) < 1e-3 && math.abs(mb - meanB) < 1e-3, s"$et means")
      val va = (a.map(x => x * x).sum - a.sum * a.sum / a.length) / (a.length - 1)
      val vb = (b.map(x => x * x).sum - b.sum * b.sum / b.length) / (b.length - 1)
      val zn = (meanA - meanB) / math.sqrt(va / a.length + vb / b.length)
      assert(math.abs(z - zn) < 1e-2, s"$et z $z vs naive $zn")
    }
  }

  test("events_rfm: scores equal a naive quintile-threshold replay, buckets near-balanced") {
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def pct(xs: Seq[Double], p: Double): Double = {
      val s = xs.sorted; val pos = (s.length - 1) * p
      val lo = pos.toInt
      if (lo == pos) s(lo) else s(lo) + (pos - lo) * (s(lo + 1) - s(lo))
    }
    val per = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(max(unix_millis(col("ts"))).as("r"), count(lit(1)).as("f"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("m"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    def scores(vals: Seq[Double]) = {
      val cuts = Analytics.RfmCuts.map(p => r4(pct(vals, p)))
      (v: Double) => 1 + cuts.count(v > _)
    }
    val rs = scores(per.map(_._2.toDouble).toSeq)
    val fs = scores(per.map(_._3.toDouble).toSeq)
    val ms = scores(per.map(_._4).toSeq)
    val naive = per.map { case (u, r, f, m) =>
      u -> ((rs(r.toDouble), fs(f.toDouble), ms(m)))
    }.toMap
    val got = Analytics.eventsRfm(spark, sfDir).collect()
      .map(x => x.getLong(0) ->
        ((x.getInt(4), x.getInt(5), x.getInt(6), x.getString(7)))).toMap
    assert(got.keySet == naive.keySet)
    got.foreach { case (u, (r, f, m, seg)) =>
      assert((r, f, m) == naive(u), s"user $u: ($r,$f,$m) vs ${naive(u)}")
      assert(seg == s"$r$f$m")
      assert(r >= 1 && r <= 5 && f >= 1 && f <= 5 && m >= 1 && m <= 5)
    }
    // threshold quintiles on a mostly-tie-free metric stay near n/5
    val mBuckets = got.values.groupBy(_._3).view.mapValues(_.size)
    assert(mBuckets.size == 5 &&
      mBuckets.values.forall(n => n >= got.size / 10), s"monetary buckets $mBuckets")
  }

  test("events_anomaly_mad: flagged set equals a naive med/MAD replay; robust to the tail") {
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // linear-interpolation median — the percentile/quantile_cont rule
    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted; val p = (s.length - 1) * 0.5
      val lo = p.toInt
      if (lo == p) s(lo) else s(lo) + (p - lo) * (s(lo + 1) - s(lo))
    }
    val ev = Tables.events(spark, sfDir)
      .select("event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val naive = ev.groupBy(_._2).iterator.flatMap { case (_, rows) =>
      val vals = rows.map(_._3).toSeq
      val m = r4(med(vals))
      val d = r4(med(vals.map(v => math.abs(v - m))))
      rows.collect {
        case (id, _, v) if d > 0 && math.abs(v - m) > Analytics.MadK * 1.4826 * d =>
          id -> r4((v - m) / (1.4826 * d))
      }
    }.toMap
    val got = Analytics.eventsAnomalyMad(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(5)).toMap
    assert(got == naive, s"${got.size} flagged vs naive ${naive.size}")
    assert(got.nonEmpty, "heavy-tailed values must flag at this SF")
    // robustness: every flag is in the tail the z-score face can mask
    assert(got.keySet.forall(id => ev.find(_._1 == id).exists(_._3 > 100.0)) ||
      got.values.exists(_ < 0), "sanity: flags live in the tails")
  }

  test("events_top_paths: equals a naive sessionize-and-count replay") {
    val evs = Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val paths = evs.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._2.getTime, e._2.getNanos, e._3))
      val sessions = scala.collection.mutable.ArrayBuffer
        .empty[scala.collection.mutable.ArrayBuffer[String]]
      var prevMs = Option.empty[Long]
      sorted.foreach { e =>
        // unix_millis semantics: the gap compares MILLISECOND floors
        val ms = e._2.getTime
        if (prevMs.forall(p => ms - p > 30L * 60 * 1000))
          sessions += scala.collection.mutable.ArrayBuffer.empty[String]
        sessions.last += e._4
        prevMs = Some(ms)
      }
      sessions.map(_.take(Analytics.PathSteps).mkString(">"))
    }
    val counts = paths.groupBy(identity).map { case (p, l) => p -> l.size.toLong }
    val expect = counts.toSeq.sortBy { case (p, n) => (-n, p) }
      .take(Analytics.PathTopK).zipWithIndex
      .map { case ((p, n), i) => (i + 1, p, n) }
    val got = Analytics.eventsTopPaths(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got == expect, s"got ${got.take(3)}… exp ${expect.take(3)}…")
    assert(got.nonEmpty && got.forall(_._2.split(">").length <= Analytics.PathSteps))
  }

  test("events_top_paths: two-exchange plan — one user_id exchange serves the whole session chain") {
    // scale posture: gap window, running session-id sum, per-session
    // step window and the path aggregation ALL cluster on user_id
    // (HashPartitioning on a key subset satisfies the finer
    // clusterings), so the plan holds exactly TWO exchanges — user_id
    // and the path-count hash; the rank window consumes
    // TakeOrderedAndProject's single-partition k-row output with no
    // third exchange. The step≤cap filter must also plan as
    // WindowGroupLimit (map-side top-k pruning before row_number).
    val plan = explainString(Analytics.eventsTopPaths(spark, sfDir))
    val n = "\\(\\d+\\) Exchange\\b".r.findAllIn(plan).length
    assert(n == 2, s"expected 2 exchanges, got $n\n${plan.take(3000)}")
    assert(plan.contains("TakeOrderedAndProject"),
      "top-k must plan as TakeOrderedAndProject")
    assert(plan.contains("WindowGroupLimit"),
      "step cap must prune via WindowGroupLimit")
  }

  test("events_attribution: equals a naive last-touch carry; value mass reconciles") {
    def r2(x: BigDecimal) = x.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    val evs = Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3),
        r.getDouble(4)))
    val credited = evs.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._2.getTime, e._2.getNanos, e._3))
      var lastTouch: String = null
      sorted.flatMap { e =>
        val out = if (e._4 == "purchase")
          Some((if (lastTouch == null) "(direct)" else lastTouch, e._5)) else None
        if (e._4 != "purchase") lastTouch = e._4
        out
      }
    }.toSeq
    val expect = credited.groupBy(_._1).map { case (ch, rows) =>
      ch -> ((rows.size.toLong, r2(rows.map(r => BigDecimal(r._2)).sum)))
    }
    val got = Analytics.eventsAttribution(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == expect, s"got $got\nexp $expect")
    // every purchase is attributed exactly once
    assert(got.values.map(_._1).sum == evs.count(_._4 == "purchase").toLong)
  }

  test("dq_drift: PSI matches the naive bucket replay; verdicts at the rounded cuts") {
    import graft.operators.DataQuality
    val rows = Tables.events(spark, sfDir).select("event_type", "value", "ts").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getTimestamp(2).getTime))
    val lo = rows.map(_._3).min
    val hi = rows.map(_._3).max
    val marked = rows.map { case (t, v, ms) =>
      (t, math.floor(v / DataQuality.PsiBucketW).toLong, ms * 2 <= lo + hi)
    }
    val counts = marked.groupBy(m => (m._1, m._2)).view.mapValues { xs =>
      (xs.count(_._3).toLong, xs.count(!_._3).toLong)
    }.toMap
    def d12(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = counts.keys.map(_._1).toSeq.distinct.map { t =>
      val cs = counts.filter(_._1._1 == t).values.toSeq
      val (tb, tc, nb) = (cs.map(_._1).sum, cs.map(_._2).sum, cs.size.toLong)
      val psi = r6(cs.map { case (cb, cc) =>
        val p = (cb + 1).toDouble / (tb + nb)
        val q = (cc + 1).toDouble / (tc + nb)
        d12((p - q) * math.log(p / q))
      }.sum.toDouble)
      val verdict =
        if (psi > DataQuality.PsiMajor) "major"
        else if (psi > DataQuality.PsiModerate) "moderate" else "stable"
      t -> ((nb, tb, tc, psi, verdict))
    }.toMap
    val got = DataQuality.dqDrift(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getString(5)))).toMap
    assert(got == expect, s"got $got\nexp $expect")
    // both halves genuinely populated, every event type reported
    assert(got.keySet == rows.map(_._1).toSet)
    assert(got.values.forall(v => v._2 > 0 && v._3 > 0))
  }

  test("events_survival: Kaplan-Meier curve matches the naive product-limit replay") {
    val ev = eventRows()
    val lifetimes = ev.groupBy(_._1).values.toSeq.map { es =>
      val (first, last) = (es.map(_._3).min, es.map(_._3).max)
      (first, last)
    }
    val horizon = ev.map(_._3).max
    val marked = lifetimes.map { case (f, l) =>
      ((l - f) / 86400000L, horizon - l > Analytics.SurvivalChurnMs)
    }
    val byDur = marked.groupBy(_._1).view.mapValues { xs =>
      (xs.count(_._2).toLong, xs.count(!_._2).toLong)
    }.toMap
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r10(x: Double) = BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP)
    var atRisk = marked.size.toLong
    var cum = BigDecimal(0)
    var deadAll = false
    val expect = byDur.keys.toSeq.sorted.map { t =>
      val (d, c) = byDur(t)
      val nRisk = atRisk
      // the operator's exact chain: round-10 ln factors into an
      // exact decimal running sum; d = n_risk zeroes the curve
      if (d < nRisk) cum += r10(math.log(1.0 - d.toDouble / nRisk))
      else deadAll = true
      val surv = if (deadAll) 0.0 else r4(math.exp(cum.toDouble))
      atRisk -= (d + c)
      (t, nRisk, d, c, surv)
    }
    val got = Analytics.eventsSurvival(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .sortBy(_._1).toSeq
    assert(got == expect, s"got $got\nexp $expect")
    // product-limit invariants: risk set telescopes to the user
    // count, the curve is monotone non-increasing from 1
    assert(got.head._2 == lifetimes.size.toLong)
    assert(got.map(_._5) == got.map(_._5).sorted.reverse)
    assert(got.map(r => r._3 + r._4).sum == lifetimes.size.toLong)
  }
}
