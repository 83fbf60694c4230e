package graft

import graft.functions.KmvSketch
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source-format round-trips (SURVEY §2.1 #16/#13) and KMV sketch
  * accuracy. */
class SourcesKmvSpec extends SparkSpecBase {

  test("csv / json / text round-trip the documents table") {
    val src = Tables.documents(spark, sfDir).select("doc_id", "lang", "n_chars")
    val base = Files.createTempDirectory("graft_src_").toString
    src.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    src.write.mode("overwrite").json(s"$base/json")
    val csvBack = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(s"$base/csv")
    val jsonBack = spark.read.json(s"$base/json")
    assert(csvBack.count() == src.count())
    assert(jsonBack.count() == src.count())
    assert(jsonBack.select(sum(col("n_chars"))).collect().head.getLong(0) ==
      src.select(sum(col("n_chars"))).collect().head.getLong(0))
    // raw text lines (TextInputFormat)
    src.select(concat_ws("\t", col("doc_id"), col("lang")))
      .write.mode("overwrite").text(s"$base/text")
    val textBack = spark.read.text(s"$base/text")
      .select(split(col("value"), "\t").getItem(0).cast("bigint").as("doc_id"))
    assert(textBack.count() == src.count())
  }

  test("Tables.load handles both events.ts encodings (nanos-long and native timestamp)") {
    // The generator's ts encoding has flipped across driver rounds
    // (TIMESTAMP(NANOS) → timestamp[us]); an unconditional nanos
    // fixup crashed the round-9 bench at analysis time. Pin the
    // contract: a LONG ts column is magnitude-probed — nanos-scale
    // values are floored to micros, micros-scale values pass through
    // (the third plausible encoding, which a blind div-1000 would
    // silently shrink 1000×) — and a native timestamp passes
    // through; identical values every way.
    val micros = Seq(1700000000000001L, 1700000000123456L, 1700009999999999L)
    withTempDir("tsenc") { dir =>
      import spark.implicits._
      // nanos-long encoding (the legacy reader surface): ts BIGINT
      micros.map(us => (1L, us * 1000 + 789, 2L, "view", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
      val loaded = graft.Tables.events(spark, dir)
      assert(loaded.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType)
      val got = loaded.select(unix_micros(col("ts"))).collect()
        .map(_.getLong(0)).sorted.toSeq
      assert(got == micros, s"nanos-long path: $got")
    }
    withTempDir("tsenc3") { dir =>
      import spark.implicits._
      // plain INT64 micros (never shipped, but one generator flip
      // away): the magnitude probe must NOT divide these by 1000
      micros.map(us => (1L, us, 2L, "view", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
      val got = graft.Tables.events(spark, dir)
        .select(unix_micros(col("ts"))).collect()
        .map(_.getLong(0)).sorted.toSeq
      assert(got == micros, s"micros-long path: $got")
    }
    withTempDir("tsenc2") { dir =>
      import spark.implicits._
      // native timestamp encoding (the current generator)
      micros.map(us => (1L, java.sql.Timestamp.from(
          java.time.Instant.ofEpochSecond(us / 1000000, (us % 1000000) * 1000)),
          2L, "view", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$dir/events.parquet")
      val got = graft.Tables.events(spark, dir)
        .select(unix_micros(col("ts"))).collect()
        .map(_.getLong(0)).sorted.toSeq
      assert(got == micros, s"native path: $got")
    }
  }

  test("spread repartitions single-split inputs and passes multi-split inputs through") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sfDir)
    val cores = spark.sparkContext.defaultParallelism
    // Single parquet file → one split → the keyed repartition fires.
    assert(docs.rdd.getNumPartitions < cores)
    assert(Tables.spread(spark, docs, "doc_id").rdd.getNumPartitions == cores)
    // A multi-FILE scan (the production 100 TB shape) → untouched.
    withTempDir("graft_spread_") { dir =>
      docs.repartition(cores * 2, col("doc_id"))
        .write.mode("overwrite").parquet(s"$dir/docs")
      val multi = spark.read.parquet(s"$dir/docs")
      assert(multi.rdd.getNumPartitions >= cores)
      assert(Tables.spread(spark, multi, "doc_id") eq multi)
    }
  }

  test("spread never probes (or executes) an exchange-bearing plan") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sfDir)
    val cores = spark.sparkContext.defaultParallelism
    // A plan already shaped by the caller passes through unprobed —
    // under AQE, a df.rdd probe on it would materialize the upstream
    // shuffle stage at probe time. Job count proves no execution.
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val wide = docs.repartition(cores * 2, col("doc_id"))
      assert(Tables.spread(spark, wide, "doc_id") eq wide)
      // Probe jobs (AQE stage materialization) submit synchronously
      // inside spread; drain the async listener bus deterministically
      // (a fixed sleep is flaky under load and wastefully long idle).
      org.apache.spark.graft.TestBus.drain(spark.sparkContext)
      assert(jobs.get() == 0, s"spread probe ran ${jobs.get()} job(s)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("schema evolution: merged read unions the schemas, old rows NULL in the new column") {
    import graft.sources.FileRoundTrips
    FileRoundTrips.schemaEvolutionRead(spark, sfDir).collect() // materialize the writes
    val out = FileRoundTrips.scratch("evolve", sfDir)
    val merged = spark.read
      .option("mergeSchema", "true").option("recursiveFileLookup", "true")
      .parquet(out)
    // Union schema: the v1 files don't carry o_orderpriority, the
    // merged relation does.
    assert(merged.columns.toSet ==
      Set("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"))
    assert(spark.read.parquet(s"$out/v1").columns.toSet ==
      Set("o_orderkey", "o_orderstatus", "o_totalprice"))
    // NULL backfill lands exactly on the old-schema (even-key) rows.
    assert(merged.filter(col("o_orderpriority").isNull)
      .filter(col("o_orderkey") % 2 =!= 0).count() == 0)
    assert(merged.filter(col("o_orderpriority").isNull).count() ==
      merged.filter(col("o_orderkey") % 2 === 0).count())
    // Nothing lost across the two batches.
    assert(merged.count() == Tables.orders(spark, sfDir).count())
  }

  test("KMV sketch estimates distinct counts within 30% at k=64") {
    import spark.implicits._
    val exact = Tables.lineitem(spark, sfDir)
      .select(count_distinct(col("l_partkey"))).collect().head.getLong(0)
    val est = Tables.lineitem(spark, sfDir)
      .select(md5(col("l_partkey").cast("string")).as("h")).as[String]
      .groupByKey(_ => 0).agg(new KmvSketch(64).toColumn)
      .map(_._2).collect().head.distinct_estimate
    assert(math.abs(est - exact) / exact < 0.3, s"est=$est exact=$exact")
  }

  test("sketch_kmv_intersect equals a naive JVM sketch-algebra replay; exact tier reconciles") {
    import graft.operators.Aggregators
    val k = Aggregators.KmvMergeK
    val bySrc = Tables.events(spark, sfDir)
      .select(col("event_type"), md5(col("user_id").cast("string")).as("h")).distinct()
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val kept = bySrc.view.mapValues(_.toSeq.sorted.take(k).toSet).toMap
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = Aggregators.sketchKmvIntersect(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val srcs = bySrc.keySet.toSeq.sorted
    val expectPairs = (for { a <- srcs; b <- srcs if a < b } yield (a, b)).toSet
    assert(rows.keySet == expectPairs)
    rows.foreach { case ((a, b), r) =>
      val u = (kept(a) ++ kept(b)).toSeq.sorted.take(k)
      val theta = u.last
      val nInterKept = u.count(x => kept(a)(x) && kept(b)(x))
      val nExact = bySrc(a).intersect(bySrc(b)).size
      assert(r.getInt(2) == u.size && r.getInt(3) == nInterKept)
      assert(r.getLong(4) == nExact.toLong)
      val unionEst =
        if (u.size < k) u.size.toDouble
        else (k - 1).toDouble /
          (java.lang.Long.parseLong(theta.take(15), 16).toDouble / 1152921504606846976.0)
      assert(r.getDouble(5) == r4(nInterKept.toDouble / u.size))
      assert(r.getDouble(6) == r4(nInterKept.toDouble / u.size * unionEst))
      // honesty: when the union fits in the sketch the estimate is
      // EXACT (kept = full sets); otherwise demand sketch-accuracy
      if (u.size < k) assert(r.getDouble(6) == nExact.toDouble)
      else assert(math.abs(r.getDouble(6) - nExact) <= math.max(8.0, 0.5 * nExact),
        s"pair ($a,$b): est ${r.getDouble(6)} vs exact $nExact")
    }
    // Audience overlap is real signal: every pair of event types
    // shares users at every SF, so the accuracy claim has teeth.
    assert(rows.values.forall(_.getLong(4) > 0),
      "event-type audiences must overlap for the estimator to be non-trivial")
  }

  test("KMV merge is order-insensitive and bounded") {
    val k = new KmvSketch(8)
    val hs = (1 to 100).map(i => f"$i%032x")
    val a = hs.take(50).foldLeft(k.zero)(k.reduce)
    val b = hs.drop(50).foldLeft(k.zero)(k.reduce)
    val m1 = k.merge(a, b)
    val m2 = k.merge(b, a)
    assert(m1 == m2 && m1.size == 8)
    assert(m1 == hs.sorted.take(8))
  }
}
