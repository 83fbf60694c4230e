package graft

import graft.operators.{Aggregators, DataQuality, Dedup, Similarity}
import graft.sources.DbExchange
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Round-3 scale-path operators: bucketed embedding near-dup,
  * multi-probe IVF, approx quantiles, JDBC round-trip, and the real
  * sampling API (SURVEY §2.1 #12/#18, §2.4 #44b/#46b, §5). */
class ScaleOpsSpec extends SparkSpecBase {

  /** Deterministic pseudo-random vector; a fresh seeded PRNG per
    * vector keeps different vectors statistically independent (a
    * linear-congruential coordinate formula made consecutive seeds
    * ~90%-correlated and flooded the "planted" set). */
  private def vec(seed: Int): Array[Float] = {
    val rnd = new scala.util.Random(seed * 1000003 + 7)
    Array.fill(64)((rnd.nextDouble() - 0.5).toFloat)
  }

  /** 100 base vectors + 20 planted near-identical copies (one
    * coordinate nudged) — the high-cosine regime sign-LSH is built
    * for; the sf corpus's near-dups sit at cos 0.4-0.5, below any
    * useful sign-LSH operating point. */
  private lazy val plantedDir: String = {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_planted_")
    // Shared across tests in this suite, so cleanup is deferred to
    // JVM exit (same no-tmp-accumulation rule as withTempDir).
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import scala.jdk.CollectionConverters._
      Files.walk(root).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(p => { Files.deleteIfExists(p); () })
    }))
    val dir = root.toString
    val base = (0 until 100).map(i => (i.toLong, vec(i)))
    val dups = (0 until 20).map { i =>
      val v = vec(i); v(0) = v(0) + 0.01f
      ((100 + i).toLong, v)
    }
    (base ++ dups).toDF("vec_id", "embedding")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("dedup_embedding_lsh: recall >= 0.9 on planted near-identical pairs") {
    val exact = Dedup.embedding(spark, plantedDir).collect()
      .filter(_.getDouble(2) >= 0.9)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size >= 20, s"expected >=20 planted high-cos pairs, got ${exact.size}")
    val lsh = Dedup.embeddingLsh(spark, plantedDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(lsh.contains).toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall on ${exact.size} planted pairs")
  }

  test("dedup_embedding_lsh output is a subset of the exact operator's pairs") {
    val exact = Dedup.embedding(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Dedup.embeddingLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh.nonEmpty, "LSH tier should surface at least one candidate pair")
    assert(lsh.subsetOf(exact),
      s"verify stage must enforce the same cos >= ${Dedup.EmbCosTau} cut: ${lsh -- exact}")
  }

  test("dedup_embedding_lsh plan: embeddings never ride the candidate self-join") {
    val plan = explainString(Dedup.embeddingLsh(spark, sfDir))
    // The banded relation feeding the candidate join must carry only
    // (vec_id, band, bucket) — the vectors join back after distinct.
    val joins = "SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findAllIn(plan).length
    assert(joins >= 3, s"expected candidate join + 2 embedding joins:\n${plan.take(2000)}")
  }

  test("ann_ivf multi-probe: recall@5 >= 0.8 vs exact brute force") {
    def topk(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = topk(Similarity.annBruteForce(spark, sfDir))
    val ivf = topk(Similarity.annIvf(spark, sfDir))
    val recall = exact.count(ivf.contains).toDouble / exact.size
    assert(recall >= 0.8, s"IVF nprobe=${Similarity.NumProbes} recall@5 = $recall")
  }

  test("ann_ivf_ingest: batch classification equals the index's own assignments, zero Lloyd retrain") {
    // FAISS add(): with the index on disk, ingesting a batch must
    // reproduce exactly the cluster the build pass gave those same
    // vectors — same centroids, same (cos DESC, lowest-c_id) argmax.
    val ingested = Similarity.annIvfIngest(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ingested.nonEmpty)
    val idx = Similarity.ivfIndexDir(spark, sfDir, Similarity.BigK)
    val built = spark.read
      .schema("vec_id BIGINT, cluster BIGINT, embedding ARRAY<FLOAT>")
      .parquet(s"$idx/assignments")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ingested.foreach { case (v, c) =>
      assert(built(v) == c, s"vec $v: ingest says $c, build said ${built(v)}") }
    // No retrain on re-ingest: with the index memoized, a second
    // ingest is pure classification — its jobs carry no Lloyd
    // DECIMAL(28,10) mean aggregation (witnessed on the executed
    // plans via a QueryExecutionListener), and its output is
    // identical.
    val lloydSeen = new java.util.concurrent.atomic.AtomicBoolean(false)
    val qel = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        if (qe.executedPlan.toString.toLowerCase.contains("decimal(28,10)"))
          lloydSeen.set(true)
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(qel)
    try {
      val again = Similarity.annIvfIngest(spark, sfDir).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      org.apache.spark.graft.TestBus.drain(spark.sparkContext)
      assert(again == ingested)
      assert(!lloydSeen.get, "re-ingest ran a Lloyd mean aggregation")
    } finally spark.listenerManager.unregister(qel)
  }

  test("SQ8: near-lossless — recall@5 >= 0.9 vs exact, error bounded by half a code step") {
    try {
      def topk(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val exact = topk(Similarity.annBruteForce(spark, sfDir))
      val sq8 = topk(Similarity.annSq8(spark, sfDir))
      val recall = exact.count(sq8.contains).toDouble / exact.size
      assert(recall >= 0.9, s"SQ8 recall@5 = $recall")
      // Affine uint8 quantization: per-dim error ≤ half a code step =
      // range_d / (2·255). Bound with the widest dim's range.
      val eD = Tables.embeddings(spark, sfDir)
        .select(org.apache.spark.sql.functions.posexplode(
          org.apache.spark.sql.functions.col("embedding"))
          .as(Seq("pos", "v")))
      val ranges = eD.groupBy("pos")
        .agg(org.apache.spark.sql.functions.expr("max(v) - min(v)").as("r"))
        .collect().map(_.getAs[Number]("r").doubleValue())
      val maxStep = ranges.max / (2.0 * Similarity.Sq8Levels)
      val worst = Similarity.embeddingSq8(spark, sfDir).collect()
        .map(_.getDouble(2)).max
      assert(worst <= maxStep + 1e-6,
        s"max reconstruction error $worst exceeds half-step bound $maxStep")
    } finally graft.operators.Dedup.clearCaches()
  }

  test("broadcast-relation centroid assignment equals the plan-literal arg-max") {
    // The production-k path (no plan literals) must reproduce the
    // map-only literal path exactly, including the lowest-c_id
    // cosine tie-break.
    val eD = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        col("embedding").cast("array<double>").as("emb_d"))
    val cents = Similarity.lloydCentroids(eD)
    val viaLiteral = eD.select(col("vec_id"),
        array_max(Similarity.scored(cents)).getField("c_id").as("cluster"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaBroadcast = Similarity.assignBroadcast(spark, eD, cents)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaLiteral == viaBroadcast)
    // Map-side: the centroid relation rides a broadcast join, the
    // vector side is never shuffled before the partial agg.
    val plan = explainString(Similarity.assignBroadcast(spark, eD, cents))
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("parameterized ann_ivf takes the broadcast path for k above the literal ceiling") {
    val k = Similarity.BroadcastAssignK + 8
    val rows = Similarity.annIvf(spark, sfDir, k, Similarity.NumProbes).collect()
    assert(rows.length == Similarity.NumQueries * Similarity.TopK)
    // ranks contiguous 1..TopK per query
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to Similarity.TopK))
    }
  }

  test("ann_ivf_big (k=128): whole pipeline is literal-free and ranks stay contiguous") {
    // The production-k entry: index build (every Lloyd assignment),
    // final assignment, and query probe all ride the broadcast
    // centroid relation — the plan must carry the
    // BroadcastNestedLoopJoin and no per-centroid literal arrays
    // (128×64 doubles would be ~8k plan constants).
    val df = Similarity.annIvfBig(spark, sfDir)
    val plan = explainString(df)
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    val rows = df.collect()
    assert(rows.nonEmpty)
    // At k=128 over the sf corpus some probes can surface fewer than
    // TopK candidates; whatever is returned must rank 1..n per query
    // with no gaps (the oracle mirrors the exact same cut).
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val rks = rs.map(_.getInt(1)).sorted.toSeq
      assert(rks == (1 to rks.length), s"query $q ranks $rks")
      assert(rks.length <= Similarity.TopK)
    }
  }

  test("ann_ivf_serve: persisted index reproduces the build path; serving runs zero Lloyd passes") {
    // Build+serve must equal the in-process build path bit-for-bit
    // (same Lloyd code wrote the index, same probe/rank semantics).
    def keyed(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).sorted.toSeq
    val served = keyed(Similarity.annIvfServe(spark, sfDir).collect())
    val built = keyed(Similarity.annIvfBig(spark, sfDir).collect())
    assert(served == built)
    // The TotalOrderPartitioner contract: sample/refine once, serve
    // from the artifact. With the index on disk, CONSTRUCTING the
    // serve plan must launch zero Spark jobs — no Lloyd assignment
    // passes, no driver-side centroid collect, not even schema
    // inference (explicit schemas on both index reads).
    val sc = spark.sparkContext
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    sc.addSparkListener(listener)
    try {
      val plan = explainString(Similarity.annIvfServe(spark, sfDir))
      org.apache.spark.graft.TestBus.drain(sc)
      assert(jobs.get == 0, s"serve-plan construction launched ${jobs.get} jobs")
      // Structural twin of the zero-jobs check: the plan reads the
      // persisted relations and carries no Lloyd mean signature.
      assert(plan.contains(s"ivfindex_k${Similarity.BigK}"),
        "serve plan must scan the persisted index:\n" + plan.take(1500))
      assert(!plan.toLowerCase.contains("decimal(28,10)"),
        "Lloyd mean aggregation leaked into the serve plan")
    } finally sc.removeSparkListener(listener)
  }

  test("profile_table core: planted nulls/dupes counted exactly, non-numerics NULL min/max") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("a"), Some(2.0)),
      (Some(1L), None, Some(4.0)),
      (None, Some("b"), None),
      (Some(3L), Some("a"), Some(4.0))).toDF("k", "s", "v")
    val prof = Aggregators.profileOf(df, Seq("k", "s", "v"), Set("k", "v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)), Option(r.get(5))))).toMap
    assert(prof("k") == ((4L, 1L, 2L, Some(1.0), Some(3.0))))
    assert(prof("s") == ((4L, 1L, 2L, None, None)))
    assert(prof("v") == ((4L, 1L, 2L, Some(2.0), Some(4.0))))
  }

  test("dq_check core: planted violations of every constraint counted exactly") {
    import spark.implicits._
    val orders = Seq(
      // (o_orderkey, o_custkey, o_orderstatus, o_totalprice)
      (Some(1L), Some(10L), "O", 100.0),
      (Some(1L), Some(10L), "F", 200.0),   // dup orderkey, dup custkey
      (Some(2L), None, "P", 300.0),        // null custkey
      (Some(3L), Some(11L), "X", -5.0),    // bad status, bad range
      (Some(4L), Some(99L), "O", 400.0))   // orphan custkey
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val customer = Seq(10L, 11L).toDF("c_custkey")
    val rep = DataQuality.dqReport(orders, customer).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(rep("not_null(o_custkey)") == ((1L, false)))
    assert(rep("unique(o_orderkey)") == ((1L, false)))
    // 5 rows, 3 distinct custkeys (10, 11, 99 — NULL excluded by
    // count distinct) ⇒ 2 violations
    assert(rep("unique(o_custkey)") == ((2L, false)))
    assert(rep("range(o_totalprice>0)") == ((1L, false)))
    assert(rep("in_set(o_orderstatus)") == ((1L, false)))
    // NULL custkey doesn't join ⇒ also counted orphan: 1 (key 99) + 1 (null)
    assert(rep("ref(o_custkey->customer)") == ((2L, false)))
    // and on the real corpus both verdict branches appear
    val real = DataQuality.dqCheck(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(real.size == 6 && !real("unique(o_custkey)") &&
      real.count(_._2) == 5)
  }

  test("agg_incremental: stored-state + batch merge equals the full recompute") {
    Dedup.clearCaches() // force a fresh stored-state build this test
    val merged = Aggregators.aggIncremental(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    val full = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("s"),
        round(sum(col("l_quantity")) / count(lit(1)), 4).as("a"),
        round(max(col("l_quantity")), 2).as("m"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(merged == full)
    // The split is genuinely two-sided (both stored and batch slices
    // contribute rows) — otherwise the merge is vacuous.
    val batchRows = Tables.lineitem(spark, sfDir)
      .filter(col("l_orderkey") % Aggregators.AggIncrMod === 0).count()
    val storedRows = Tables.lineitem(spark, sfDir)
      .filter(col("l_orderkey") % Aggregators.AggIncrMod =!= 0).count()
    assert(batchRows > 0 && storedRows > 0)
  }

  test("quantile_by_group: per-group percentiles equal naive linear interpolation") {
    def interp(xs: Seq[Double], p: Double): Double = {
      val s = xs.sorted; val pos = (s.length - 1) * p
      val lo = pos.toInt
      if (lo == pos) s(lo) else s(lo) + (pos - lo) * (s(lo + 1) - s(lo))
    }
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val vals = Tables.events(spark, sfDir).select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSeq).toMap
    val got = Aggregators.quantileByGroup(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.keySet == vals.keySet)
    got.foreach { case (t, (n, p50, p90, p99)) =>
      val xs = vals(t)
      assert(n == xs.length.toLong)
      assert(p50 == r4(interp(xs, 0.5)), s"$t p50")
      assert(p90 == r4(interp(xs, 0.9)), s"$t p90")
      assert(p99 == r4(interp(xs, 0.99)), s"$t p99")
    }
  }

  test("quantile_by_group_approx: exact values match the exact tier, all tolerance booleans true") {
    val exact = Aggregators.quantileByGroup(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val checked = Aggregators.quantileByGroupApprox(spark, sfDir).collect()
    assert(checked.length == exact.size)
    checked.foreach { r =>
      val t = r.getString(0)
      val (n, p50, p90, p99) = exact(t)
      assert(r.getLong(1) == n, s"$t n_events")
      assert(r.getDouble(2) == p50 && r.getDouble(3) == p90 &&
        r.getDouble(4) == p99, s"$t exact percentiles must match the exact tier")
      (5 to 7).foreach(i =>
        assert(r.getBoolean(i), s"$t GK estimate outside the rank bound at col $i"))
    }
  }

  test("quantile_report_approx within 1% of the exact tier") {
    val exact = Aggregators.quantileReport(spark, sfDir).collect().head
    val approx = Aggregators.quantileReportApprox(spark, sfDir).collect().head
    (0 until 3).foreach { i =>
      val (e, a) = (exact.getDouble(i), approx.getDouble(i))
      assert(math.abs(e - a) / e < 0.01, s"p[$i]: exact $e vs approx $a")
    }
    assert(exact.getLong(3) == approx.getLong(3))
  }

  test("agg_uniq_approx within 5% of the exact distinct counts") {
    // Same 🔶 contract as quantile_report_approx: no DuckDB twin (its
    // HLL is a different implementation), so the spec carries the
    // correctness claim — every estimate within 5% of the exact tier
    // (rsd 0.02 ⇒ 5% is 2.5σ), group keys and exact row counts equal.
    val exact = Aggregators.uniqCount(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val approx = Aggregators.uniqCountApprox(spark, sfDir).collect()
    assert(approx.nonEmpty && approx.length == exact.size)
    approx.foreach { r =>
      val (parts, supps, n) = exact(r.getString(0))
      assert(r.getLong(3) == n, "n_rows is exact and must match")
      assert(math.abs(r.getLong(1) - parts).toDouble / parts <= 0.05,
        s"${r.getString(0)} parts: exact $parts vs est ${r.getLong(1)}")
      assert(math.abs(r.getLong(2) - supps).toDouble / supps <= 0.05,
        s"${r.getString(0)} supps: exact $supps vs est ${r.getLong(2)}")
    }
  }

  test("quantile_report_hist within one bucket width of the exact tier") {
    val exact = Aggregators.quantileReport(spark, sfDir).collect().head
    val hist = Aggregators.quantileReportHist(spark, sfDir).collect().head
    // Interpolation error is bounded by the equi-width bucket size.
    val width = (exact.getDouble(2) * 1.1) / Aggregators.HistBuckets * 2
    (0 until 3).foreach { i =>
      val (e, h) = (exact.getDouble(i), hist.getDouble(i))
      assert(math.abs(e - h) <= math.max(width, e * 0.01),
        s"p[$i]: exact $e vs hist $h")
    }
    assert(exact.getLong(3) == hist.getLong(3))
  }

  test("fromSpec composes the same plan the hand-written aggregators produce") {
    // The ValueAggregatorDescriptor contract: a config string, not
    // code, picks the aggregators — and the composed job must equal
    // the equivalent hand-written aggregation exactly.
    val li = Tables.lineitem(spark, sfDir)
    val composed = Aggregators.fromSpec(li,
      "key:l_returnflag,count,sum:l_linenumber,uniq:l_partkey")
      .orderBy(col("l_returnflag")).collect().toSeq
    val hand = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_linenumber")).as("sum_l_linenumber"),
        count_distinct(col("l_partkey")).as("uniq_l_partkey"))
      .orderBy(col("l_returnflag")).collect().toSeq
    assert(composed == hand)
    // A mistyped descriptor must be an ERROR, not a silently dropped
    // aggregator reporting wrong numbers.
    val ex = intercept[IllegalArgumentException] {
      Aggregators.fromSpec(li, "key:l_returnflag,avg:l_quantity")
    }
    assert(ex.getMessage.contains("avg"), ex.getMessage)
    // Composed plan keeps map-side combine: partial+final HashAggregate.
    val plan = explainString(Aggregators.fromSpec(li, "key:l_returnflag,count,sum:l_quantity"))
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan.take(1500))
  }

  test("db_roundtrip: JDBC sink + partitioned source preserve every row exactly") {
    // s_nationkey is int32 in the parquet; compare type-agnostically
    // so a widening through the JDBC dialect can't mask a value diff.
    def canon(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
      r.getAs[Number](0).longValue ->
        ((r.getAs[Number](1).longValue, r.getAs[Number](2).doubleValue, r.getString(3)))
    }.toMap
    val viaDb = canon(DbExchange.dbRoundTrip(spark, sfDir).collect())
    val direct = canon(Tables.supplier(spark, sfDir)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n"), round(sum(col("s_acctbal")), 2).as("t"),
        min(col("s_name")).as("f"))
      .collect())
    assert(viaDb == direct)
  }

  test("db_roundtrip plan: JDBC read is split into range partitions (DBInputFormat shape)") {
    val plan = explainString(DbExchange.dbRoundTrip(spark, sfDir))
    assert(plan.contains("JDBCRelation"), plan.take(1500))
    assert(plan.contains("numPartitions=4"), plan.take(1500))
  }

  test("InputSampler analogue: sampleBy draws each stratum near its fraction") {
    val fractions = Map("A" -> 0.5, "N" -> 0.2, "R" -> 0.4)
    val li = Tables.lineitem(spark, sfDir)
    val totals = li.groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = li.stat.sampleBy("l_returnflag", fractions, 42L)
      .groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    fractions.foreach { case (k, f) =>
      val expected = totals(k) * f
      val got = sampled.getOrElse(k, 0L).toDouble
      // Bernoulli sampling: allow 4 sigma around the expectation.
      val sigma = math.sqrt(totals(k) * f * (1 - f))
      assert(math.abs(got - expected) <= 4 * sigma + 1,
        s"stratum $k: got $got, expected ~$expected (sigma $sigma)")
    }
    // Fixed seed on the same input is reproducible (the contract
    // TotalOrderPartitioner's InputSampler relied on).
    val again = li.stat.sampleBy("l_returnflag", fractions, 42L)
      .groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == sampled)
  }
}
