package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._

/** The round-9 TPC-H-class batch (Q7/Q8/Q10/Q11/Q15/Q17/Q18/Q21):
  * every query gets a semantics check against a naive driver-side
  * reference at sf0.001 (small enough to recompute exactly) and,
  * where the plan shape IS the point, a formatted-explain assert.
  * Reference: the public TPC-H spec's query definitions, adapted to
  * the synthetic schema (no partsupp, no commit/receipt dates) as
  * documented per-operator in Analytics.scala. */
class TpchMoreSpec extends SparkSpecBase {

  private def revenueCents(price: Double, disc: Double): BigDecimal =
    (BigDecimal(price) * (BigDecimal(1) - BigDecimal(disc)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP)

  test("tpch_q7 broadcasts both nation-enriched dims; pairs match a naive reference") {
    val df = Analytics.tpchQ7(spark, sfDir)
    val plan = explainString(df)
    // supplier+customer (nation attached) ride broadcasts; the only
    // shuffle join is lineitem↔orders.
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan.take(2500))
    val got = df.collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)) -> r.getLong(4))
      .toMap
    // Naive: join everything driver-side at sf0.001.
    val nation = Tables.nation(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val supp = Tables.supplier(spark, sfDir).collect()
      .map(r => r.getLong(0) -> nation(r.getInt(2))).toMap
    val cust = Tables.customer(spark, sfDir).collect()
      .map(r => r.getLong(0) -> nation(r.getInt(2))).toMap
    val ordCust = Tables.orders(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pair = Set("NATION_11", "NATION_12")
    val lo = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1998-01-01 00:00:00")
    val expect = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_shipdate").collect()
      .filter { r =>
        val d = r.getTimestamp(2)
        !d.before(lo) && d.before(hi)
      }
      .flatMap { r =>
        val sn = supp(r.getLong(1))
        val cn = cust(ordCust(r.getLong(0)))
        val cal = java.util.Calendar.getInstance()
        cal.setTime(r.getTimestamp(2))
        if (pair(sn) && pair(cn) && sn != cn)
          Some((sn, cn, cal.get(java.util.Calendar.YEAR)))
        else None
      }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got == expect, s"got $got expect $expect")
    assert(got.nonEmpty)
  }

  test("tpch_q8 market share stays in [0,1] and item counts match a direct filter") {
    val rows = Analytics.tpchQ8(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val share = r.getDouble(1)
      assert(share >= 0.0 && share <= 1.0, s"share $share out of range")
    }
    // n_items total = the same 6-table join counted directly.
    val asiaNations = Tables.nation(spark, sfDir)
      .join(Tables.region(spark, sfDir).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val direct = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir).filter(col("p_type") === "ECONOMY"),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, sfDir)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(asiaNations, col("c_nationkey") === col("n_nationkey"))
      .count()
    assert(rows.map(_.getLong(2)).sum == direct)
  }

  test("tpch_q10 pushes the top-20 below the window as TakeOrderedAndProject") {
    val df = Analytics.tpchQ10(spark, sfDir)
    val plan = explainString(df)
    // LimitPushDownThroughWindow: the rn <= 20 filter becomes a
    // TakeOrderedAndProject UNDER the window (per-partition top-20 +
    // driver merge — the MR top-k-with-combiner), so the "global
    // sort" never materializes more than 20 rows per task.
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2500))
    val rows = df.collect()
    assert(rows.length == 20)
    // rn is a permutation of 1..20 and revenue is non-increasing in rn.
    val byRn = rows.map(r => r.getInt(6) -> r.getDouble(4)).sortBy(_._1)
    assert(byRn.map(_._1).toSeq == (1 to 20), byRn.mkString(","))
    byRn.sliding(2).foreach { case Array((_, a), (_, b)) => assert(a >= b) }
  }

  test("tpch_q11 keeps exactly the parts above 1.2x the mean part value") {
    val got = Analytics.tpchQ11(spark, sfDir).collect()
      .map(r => r.getLong(0)).toSet
    val values = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_extendedprice", "l_discount").collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(r => revenueCents(r.getDouble(1), r.getDouble(2))).sum)
      .toMap
    val tot = values.values.sum
    val np = values.size
    val expect = values.filter { case (_, v) => v * 5 * np > tot * 6 }.keySet
    assert(got == expect,
      s"missing=${expect -- got} extra=${got -- expect}")
    assert(got.nonEmpty)
  }

  test("tpch_q15 keeps every supplier tied at the exact decimal max") {
    val df = Analytics.tpchQ15(spark, sfDir)
    // Catalyst rewrites crossJoin + equality filter into an EQUI-join
    // on the exact decimal revenue — the 1-row max side broadcasts.
    assert(explainString(df).contains("BroadcastHashJoin"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getDouble(2)).distinct
    assert(revs.length == 1, s"non-max rows leaked: ${revs.mkString(",")}")
    // And it IS the max over the naive per-supplier rollup.
    val lo = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1996-04-01 00:00:00")
    val bySupp = Tables.lineitem(spark, sfDir)
      .select("l_suppkey", "l_extendedprice", "l_discount", "l_shipdate").collect()
      .filter { r =>
        val d = r.getTimestamp(3); !d.before(lo) && d.before(hi)
      }
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(r => revenueCents(r.getDouble(1), r.getDouble(2))).sum)
    val mx = bySupp.values.max
    assert(rows.map(_.getLong(0)).toSet == bySupp.filter(_._2 == mx).keySet)
  }

  test("tpch_q17 selects below-fifth-of-average lines exactly (division-free predicate)") {
    val brandParts = Tables.part(spark, sfDir)
      .filter(col("p_brand") === "Brand#11").collect().map(_.getLong(0)).toSet
    val li = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_quantity", "l_extendedprice").collect()
    val stats = li.groupBy(_.getLong(0)).view
      .mapValues(rs => (rs.map(_.getDouble(1)).sum, rs.length)).toMap
    val kept = li.filter { r =>
      val (sq, n) = stats(r.getLong(0))
      brandParts(r.getLong(0)) && r.getDouble(1) * 5 * n < sq
    }
    val expectAvg = kept.map(r => BigDecimal(r.getDouble(2)).setScale(2)).sum.toDouble / 7.0
    val row = Analytics.tpchQ17(spark, sfDir).collect().head
    assert(row.getLong(1) == kept.length.toLong)
    assert(math.abs(row.getDouble(0) - expectAvg) < 1e-9,
      s"got ${row.getDouble(0)} expect $expectAvg")
  }

  test("tpch_q18 returns exactly the above-threshold orders with exact integral sums") {
    val rows = Analytics.tpchQ18(spark, sfDir).collect()
    val naive = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getDouble(1)).sum)
      .filter(_._2 > Analytics.Q18MinQty).toMap
    assert(rows.map(r => r.getLong(2) -> r.getDouble(5)).toMap == naive)
    assert(rows.nonEmpty)
  }

  test("tpch_q21 flags the sole-latest supplier on finished multi-supplier orders") {
    val got = Analytics.tpchQ21(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val fOrders = Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "F").collect().map(_.getLong(0)).toSet
    val perSupp = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_shipdate").collect()
      .groupBy(r => (r.getLong(0), r.getLong(1))).view
      .mapValues(_.map(_.getTimestamp(2).getTime).max).toMap
    val byOrder = perSupp.groupBy(_._1._1)
    val expect = byOrder.toSeq.flatMap { case (ok, m) =>
      val last = m.values.max
      val atMax = m.filter(_._2 == last).keys.toSeq
      if (m.size >= 2 && atMax.length == 1 && fOrders(ok))
        Some(atMax.head._2)
      else None
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got == expect, s"missing=${expect.keySet -- got.keySet} extra=${got.keySet -- expect.keySet}")
    assert(got.nonEmpty)
  }

  // --- round 10: Q2/Q9/Q20 on the derived partsupp -----------------

  /** Driver-side derived partsupp — same distinct-pairs + formulas. */
  private def naivePartsupp(): Map[(Long, Long), (Long, Long)] =
    Tables.lineitem(spark, sfDir).select("l_partkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
      .map { case (p, sp) =>
        (p, sp) -> ((p * 37 + sp * 101) % 9999 + 1, (p * 13 + sp * 11) % 99900 + 100)
      }.toMap

  test("tpch_q2 plan: the persisted pruned partsupp serves both consumers, no sort-merge join") {
    val df = Analytics.tpchQ2(spark, sfDir)
    df.collect()
    // Post-execution adaptive plan: the pruned partsupp persists
    // (InMemoryRelation serves both the per-part min and the
    // tie-keeping join-back), and AQE converts the tiny-min join-back
    // to broadcast — the FINAL plan must carry no sort-merge join.
    // (The static plan legitimately shows one: AQE sees the size at
    // runtime.)
    // Keep only the Final Plan sections: AdaptiveSparkPlan prints the
    // Initial Plan too, and the pre-AQE initial legitimately carries
    // the sort-merge the runtime converts (the Final/Initial
    // double-print gotcha from the house verify notes).
    val fin = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(fin.contains("InMemoryTableScan"), fin.take(2000))
    assert(!fin.contains("SortMergeJoin"), fin.take(2000))
  }

  test("tpch_q2 picks exactly the min-cost EUROPE suppliers per part, ties kept") {
    val nation = Tables.nation(spark, sfDir).collect()
      .map(r => (r.getInt(0), (r.getString(1), r.getInt(2)))).toMap
    val eurSupp = Tables.supplier(spark, sfDir).collect()
      .filter(r => nation(r.getInt(2))._2 == 3)
      .map(r => r.getLong(0) -> (r.getString(1), nation(r.getInt(2))._1)).toMap
    val parts = Tables.part(spark, sfDir).collect()
      .filter(r => r.getInt(4) <= 5 && r.getString(3) == "LARGE")
      .map(_.getLong(0)).toSet
    val ps = naivePartsupp().toSeq.collect {
      case ((p, sp), (_, cost)) if parts(p) && eurSupp.contains(sp) => (p, sp, cost)
    }
    val minCost = ps.groupBy(_._1).view.mapValues(_.map(_._3).min).toMap
    val expect = ps.collect {
      case (p, sp, cost) if cost == minCost(p) => (p, eurSupp(sp)._1, cost)
    }.toSet
    val got = Analytics.tpchQ2(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(5))).toSet
    assert(got == expect, s"missing=${expect -- got} extra=${got -- expect}")
    assert(got.nonEmpty)
  }

  test("tpch_q9 profit components are exact: decimal revenue, int64 cost cents") {
    val costOf = naivePartsupp().view.mapValues(_._2).toMap
    val nation = Tables.nation(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val suppNation = Tables.supplier(spark, sfDir).collect()
      .map(r => r.getLong(0) -> nation(r.getInt(2))).toMap
    val boltParts = Tables.part(spark, sfDir).collect()
      .filter(_.getString(1).contains("bolt")).map(_.getLong(0)).toSet
    val orderYear = Tables.orders(spark, sfDir).select("o_orderkey", "o_orderdate")
      .collect().map { r =>
        val cal = java.util.Calendar.getInstance(java.util.TimeZone.getTimeZone("UTC"))
        cal.setTime(r.getTimestamp(1))
        r.getLong(0) -> cal.get(java.util.Calendar.YEAR)
      }.toMap
    var rev = Map.empty[(String, Int), BigDecimal]
    var cost = Map.empty[(String, Int), Long]
    Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount").collect()
      .foreach { r =>
        if (boltParts(r.getLong(1))) {
          val key = (suppNation(r.getLong(2)), orderYear(r.getLong(0)))
          val lineRev = (BigDecimal(r.getDouble(4)) *
            (BigDecimal(1.0) - BigDecimal(r.getDouble(5))))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP)
          rev = rev.updated(key, rev.getOrElse(key, BigDecimal(0)) + lineRev)
          cost = cost.updated(key, cost.getOrElse(key, 0L) +
            costOf((r.getLong(1), r.getLong(2))) * r.getDouble(3).toLong)
        }
      }
    val got = Analytics.tpchQ9(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> (r.getDouble(2), r.getLong(3)))
      .toMap
    assert(got.keySet == rev.keySet,
      s"missing=${rev.keySet -- got.keySet} extra=${got.keySet -- rev.keySet}")
    got.foreach { case (k, (gRev, gCost)) =>
      assert(gCost == cost(k), s"$k cost $gCost != ${cost(k)}")
      assert(gRev == rev(k).toDouble, s"$k revenue $gRev != ${rev(k).toDouble}")
    }
    assert(got.nonEmpty)
  }

  test("tpch_q20 excess-stock suppliers match a naive recompute; predicate exact") {
    val ps = naivePartsupp()
    val nation = Tables.nation(spark, sfDir).collect()
      .map(r => (r.getInt(0), (r.getString(1), r.getInt(2)))).toMap
    val asiaSupp = Tables.supplier(spark, sfDir).collect()
      .filter(r => nation(r.getInt(2))._2 == 2)
      .map(r => r.getLong(0) -> (r.getString(1), nation(r.getInt(2))._1)).toMap
    val smallParts = Tables.part(spark, sfDir).collect()
      .filter(_.getString(1).startsWith("small")).map(_.getLong(0)).toSet
    val lo = java.sql.Timestamp.valueOf("1995-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val shipped = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey", "l_quantity", "l_shipdate").collect()
      .filter { r =>
        val d = r.getTimestamp(3)
        smallParts(r.getLong(0)) && !d.before(lo) && d.before(hi)
      }
      .groupBy(r => (r.getLong(0), r.getLong(1))).view
      .mapValues(_.map(_.getDouble(2).toLong).sum).toMap
    val expect = shipped.toSeq.collect {
      case ((p, sp), qty) if asiaSupp.contains(sp) && ps((p, sp))._1 * 2 > qty =>
        (sp, asiaSupp(sp)._1)
    }.toSet
    val got = Analytics.tpchQ20(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == expect, s"missing=${expect -- got} extra=${got -- expect}")
    assert(got.nonEmpty)
  }
}
