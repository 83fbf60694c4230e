package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Write-side MapReduce analogues (SURVEY §2.1 #14/#15/#17) and the
  * skew-salting utility (§5). */
class WriteSkewSpec extends SparkSpecBase {

  test("compaction: size-driven rewrite shrinks the file count, range-clusters, loses nothing") {
    import graft.sources.FileRoundTrips
    val report = FileRoundTrips.compactionRoundTrip(spark, sfDir)
    // The round-trip report must equal the source table's rollup
    // (the oracle proves this cross-engine; here we close the loop
    // in-JVM so the spec stands alone).
    val src = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        count_distinct(col("l_orderkey")).as("n_orders"))
    assert(report.collect().toSet == src.collect().toSet)

    // File physics: before = CompactFragments tiny files, after = the
    // computed bytes/target count — strictly fewer, more than one
    // (the constant is sized so the split math is exercised).
    def parquetFiles(d: String) = Option(new java.io.File(d).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).sortBy(_.getName)
    val fragDir = FileRoundTrips.compactFragDir(spark, sfDir)
    val outDir = FileRoundTrips.scratch("compact", sfDir)
    val before = parquetFiles(fragDir)
    val after = parquetFiles(outDir)
    assert(before.length == FileRoundTrips.CompactFragments)
    assert(after.length == FileRoundTrips.compactedPartitionCount(fragDir))
    assert(after.length > 1 && after.length < before.length,
      s"before=${before.length} after=${after.length}")

    // Range clustering: each compacted file covers a DISJOINT
    // l_orderkey span (repartitionByRange puts equal keys in one
    // partition), so parquet min/max footer stats prune a key-range
    // predicate to one file — the layout payoff beyond file count.
    val spans = after.map { f =>
      val r = spark.read.parquet(f.getPath)
        .agg(min(col("l_orderkey")), max(col("l_orderkey"))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    spans.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) =>
        assert(hiA < loB, s"overlapping file spans: $hiA >= $loB")
      case _ =>
    }
  }

  test("z-order layout bounds per-file spans of BOTH columns; a linear sort bounds only one") {
    import graft.sources.FileRoundTrips
    // Materialize the z-ordered copy (the query's write side).
    FileRoundTrips.zorderRoundTrip(spark, sfDir).collect()
    val zDir = FileRoundTrips.scratch("zorder", sfDir)

    val src = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
    val g = src.agg(min(col("l_partkey")), max(col("l_partkey")),
      min(col("l_suppkey")), max(col("l_suppkey"))).head()
    val (pLo, pHi, sLo, sHi) = (g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3))

    /** Mean normalized [min,max] width per output file for a column —
      * the quantity parquet footer pruning acts on: a predicate on
      * the column skips every file whose span misses it. */
    def avgSpan(d: String, c: String, lo: Long, hi: Long): Double = {
      val files = Option(new java.io.File(d).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      assert(files.nonEmpty, s"no parquet files in $d")
      val spans = files.map { f =>
        val r = spark.read.parquet(f.getPath).agg(min(col(c)), max(col(c))).head()
        (r.getLong(1) - r.getLong(0)).toDouble / (hi - lo)
      }
      spans.sum / spans.length
    }

    withTempDir("graft_linear") { lin =>
      // The comparison layout: same data, same file count, linear
      // sort on partkey only — the best single-column clustering.
      src.repartitionByRange(FileRoundTrips.ZFiles, col("l_partkey"))
        .sortWithinPartitions(col("l_partkey"))
        .write.mode("overwrite").parquet(lin)

      // Linear: primary column tightly clustered, secondary column
      // spans ~the full range in every file — suppkey predicates
      // prune nothing.
      assert(avgSpan(lin, "l_partkey", pLo, pHi) < 0.3)
      assert(avgSpan(lin, "l_suppkey", sLo, sHi) > 0.8)

      // Z-order: BOTH columns bounded well below full range — either
      // predicate prunes files. (16 files over a 2^16 z-space ≈ 64×64
      // bucket quads; range-boundary misalignment can widen a file's
      // box, hence 0.7 not 0.25.)
      assert(avgSpan(zDir, "l_partkey", pLo, pHi) < 0.7)
      assert(avgSpan(zDir, "l_suppkey", sLo, sHi) < 0.7)
    }
  }

  test("versioned table: atomic pointer swap, snapshot immutability, orphan invisibility") {
    import spark.implicits._
    import graft.sources.FileRoundTrips
    withTempDir("graft_ver_") { root =>
      def write(v: Int, rows: Seq[(Long, Int, String)]): Unit =
        rows.toDF("doc_id", "n_chars", "source")
          .write.mode("overwrite").parquet(s"$root/snap_$v")
      def current() = FileRoundTrips
        .readSnapshot(spark, root, FileRoundTrips.currentSnapshot(root))
        .collect().map(_.getLong(0)).toSet
      write(1, Seq((1L, 10, "a"), (2L, 20, "b")))
      FileRoundTrips.commitSnapshot(root, 1)
      assert(FileRoundTrips.currentSnapshot(root) == 1 &&
        current() == Set(1L, 2L))
      // orphan: data written, never committed — invisible
      write(2, Seq((9L, 90, "z")))
      assert(FileRoundTrips.currentSnapshot(root) == 1 &&
        current() == Set(1L, 2L), "uncommitted snapshot leaked")
      // commit flips the pointer; v1 remains readable (time travel)
      FileRoundTrips.commitSnapshot(root, 2)
      assert(current() == Set(9L))
      assert(FileRoundTrips.readSnapshot(spark, root, 1)
        .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
      // the swap leaves no temp debris behind
      val leftovers = new java.io.File(root).listFiles()
        .filter(_.getName.startsWith("_CURRENT.tmp"))
      assert(leftovers.isEmpty, s"temp pointer files left: ${leftovers.toSeq}")
    }
  }

  test("json/xml round-trips: real sink files on disk, counts conserved") {
    import graft.sources.FileRoundTrips
    val j = FileRoundTrips.jsonRoundTrip(spark, sfDir)
    assert(j.columns.toSeq == Seq("o_orderstatus", "n_orders", "sum_price"))
    assert(j.collect().map(_.getLong(1)).sum ==
      Tables.orders(spark, sfDir).count())
    val jdir = new java.io.File(FileRoundTrips.scratch("jsonl", sfDir))
    assert(jdir.listFiles().exists(_.getName.endsWith(".json.gz")),
      "gzip json part files missing")
    val x = FileRoundTrips.xmlRoundTrip(spark, sfDir)
    assert(x.collect().map(_.getLong(1)).sum ==
      Tables.customer(spark, sfDir).count())
    val xdir = new java.io.File(FileRoundTrips.scratch("xml", sfDir))
    val xfile = xdir.listFiles().find(f => f.getName.startsWith("part-")).get
    val head = scala.io.Source.fromFile(xfile).getLines().take(3).mkString("\n")
    assert(head.contains("<customers>") || head.contains("<customer>"), head)
  }

  test("versioned optimize: file count collapses, content identical, old layout readable") {
    import graft.sources.FileRoundTrips
    val rep = FileRoundTrips.versionedOptimize(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // content unchanged across the compaction
    assert(rep.map(t => (t._2, t._3)).distinct.length == 1, rep.toSeq)
    // find the table root this invocation wrote (freshScratch: newest)
    val root = new java.io.File(FileRoundTrips.scratch("", sfDir))
      .getParentFile.listFiles()
      .filter(_.getName.startsWith("veropt_"))
      .maxBy(_.lastModified())
    def parts(v: Int) = new java.io.File(root, s"snap_$v").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parts(1) >= 32, s"fragmented version has ${parts(1)} files")
    assert(parts(2) <= 2, s"compacted version has ${parts(2)} files")
    assert(FileRoundTrips.currentSnapshot(root.getPath) == 2)
    // pre-compaction version still readable (rollback path)
    assert(FileRoundTrips.readSnapshot(spark, root.getPath, 1).count() ==
      FileRoundTrips.readSnapshot(spark, root.getPath, 2).count())
  }

  test("dynamic vs static partition overwrite: dynamic preserves sibling partitions") {
    import spark.implicits._
    withTempDir("graft_dyn_") { out =>
      def write(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.partitionBy("lang").mode("overwrite").parquet(out)
      write(Seq((1L, "en"), (2L, "fr"), (3L, "de")).toDF("id", "lang"))
      val key = "spark.sql.sources.partitionOverwriteMode"
      def langs() = new java.io.File(out).listFiles()
        .filter(_.getName.startsWith("lang=")).map(_.getName).toSet
      assert(langs() == Set("lang=en", "lang=fr", "lang=de"))
      // dynamic: rewriting only en leaves fr/de intact
      spark.conf.set(key, "dynamic")
      try {
        write(Seq((9L, "en")).toDF("id", "lang"))
        assert(langs() == Set("lang=en", "lang=fr", "lang=de"), "dynamic wiped siblings")
        assert(spark.read.parquet(out).count() == 3)
        // static (the default): the same write wipes the whole table
        spark.conf.set(key, "static")
        write(Seq((7L, "en")).toDF("id", "lang"))
        assert(langs() == Set("lang=en"), "static mode should replace the table")
      } finally spark.conf.unset(key)
    }
  }

  test("vacuum: expires below retain floor, GCs orphans + pointer temps, idempotent, keep>=1") {
    import spark.implicits._
    import graft.sources.FileRoundTrips
    withTempDir("graft_vac_") { root =>
      def write(v: Int): Unit =
        Seq((v.toLong, v * 10, "s")).toDF("doc_id", "n_chars", "source")
          .write.mode("overwrite").parquet(s"$root/snap_$v")
      (1 to 4).foreach { v => write(v); FileRoundTrips.commitSnapshot(root, v) }
      write(7) // crashed writer: orphan above _CURRENT
      java.nio.file.Files.write(
        new java.io.File(root, "_CURRENT.tmp1").toPath, "9".getBytes("UTF-8"))
      // keep=2 retains exactly [3, 4]; deletes snap_1, snap_2 (expired),
      // snap_7 (orphan), the stray pointer temp — and nothing else.
      assert(FileRoundTrips.vacuumSnapshots(root, keep = 2) == ((2, 1, 1)))
      val names = new java.io.File(root).listFiles().map(_.getName).toSet
      assert(names == Set("snap_3", "snap_4", "_CURRENT"), names)
      assert(FileRoundTrips.currentSnapshot(root) == 4)
      assert(FileRoundTrips.readSnapshot(spark, root, 3)
        .collect().map(_.getLong(0)).toSet == Set(3L))
      // idempotent: a second vacuum deletes nothing
      assert(FileRoundTrips.vacuumSnapshots(root, keep = 2) == ((0, 0, 0)))
      // keep=1 floor: the current version itself is never deletable
      assert(FileRoundTrips.vacuumSnapshots(root, keep = 1) == ((1, 0, 0)))
      assert(FileRoundTrips.currentSnapshot(root) == 4 &&
        new java.io.File(root, "snap_4").isDirectory)
      intercept[IllegalArgumentException](
        FileRoundTrips.vacuumSnapshots(root, keep = 0))
    }
  }

  test("versioned diff: empty self-diff, and applying the feed to v1 reproduces v2") {
    import graft.sources.FileRoundTrips
    // build the same versioned table the registered query uses
    val feed = FileRoundTrips.versionedDiff(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        Option(r.getString(3))))
    assert(feed.exists(_._1 == "delete") && feed.exists(_._1 == "update") &&
      feed.exists(_._1 == "insert"))
    // round-trip apply law: v1 minus deletes, patched by updates,
    // plus inserts == v2 (recomputed from the base table)
    val base = Tables.documents(spark, sfDir)
      .select(col("doc_id"), length(col("text")).as("n_chars"), col("source"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val byOp = feed.groupBy(_._1)
    val deletes = byOp.getOrElse("delete", Array.empty).map(_._2).toSet
    val updates = byOp.getOrElse("update", Array.empty)
      .map(f => f._2 -> ((f._3.get, f._4.get))).toMap
    val inserts = byOp.getOrElse("insert", Array.empty)
      .map(f => (f._2, f._3.get, f._4.get))
    val applied = (base.filter(b => !deletes.contains(b._1))
      .map(b => updates.get(b._1).map(u => (b._1, u._1, u._2)).getOrElse(b))
      ++ inserts).toSet
    val v2 = base.filter(_._1 % 7 != 0)
      .map(b => if (b._1 % 10 == 0) (b._1, b._2 + 1000, "patched") else b)
      .toSet ++ base.filter(_._1 % 13 == 0)
      .map(b => (b._1 + 10000000L, (b._1 % 100).toInt, "new"))
    assert(applied == v2)
    // self-diff is empty: no change ⇒ no feed rows
    val selfRoot = {
      val dir = FileRoundTrips.freshScratch("verdiffself", sfDir)
      new java.io.File(dir).mkdirs()
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), length(col("text")).as("n_chars"), col("source"))
        .write.mode("overwrite").parquet(s"$dir/snap_1")
      FileRoundTrips.commitSnapshot(dir, 1)
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), length(col("text")).as("n_chars"), col("source"))
        .write.mode("overwrite").parquet(s"$dir/snap_2")
      FileRoundTrips.commitSnapshot(dir, 2)
      dir
    }
    assert(FileRoundTrips.diffSnapshots(spark, selfRoot, 1, 2).count() == 0)
  }

  test("MultipleOutputs analogue: write.partitionBy fans out by key") {
    withTempDir("graft_mo_") { dir =>
      Tables.customer(spark, sfDir)
        .write.mode("overwrite").partitionBy("c_mktsegment").parquet(dir)
      val parts = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("c_mktsegment=")).map(_.getName).toSet
      val expected = Tables.customer(spark, sfDir)
        .select("c_mktsegment").distinct().collect()
        .map(r => s"c_mktsegment=${r.getString(0)}").toSet
      assert(parts == expected)
      // partition-pruned read: only one directory's files are scanned
      val one = spark.read.parquet(dir).filter(col("c_mktsegment") === "BUILDING")
      val plan = explainString(one)
      assert(plan.contains("PartitionFilters"), plan.take(1500))
    }
  }

  test("MultipleOutputs named outputs: two schemas from one pass, both round-trip") {
    // lib/output/MultipleOutputs also supported *named* outputs with
    // distinct schemas from a single job. Spark-first analogue: run
    // the source once (persist) and write two filtered projections —
    // one scan, two sinks, each with its own schema.
    withTempDir("graft_named_") { dir =>
      val src = Tables.orders(spark, sfDir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        src.filter(col("o_totalprice") > 200000)
          .select(col("o_orderkey"), col("o_totalprice"))
          .write.mode("overwrite").parquet(s"$dir/big")
        src.filter(col("o_totalprice") <= 200000)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
          .write.mode("overwrite").parquet(s"$dir/small")
        val big = spark.read.parquet(s"$dir/big")
        val small = spark.read.parquet(s"$dir/small")
        assert(big.columns.toSeq == Seq("o_orderkey", "o_totalprice"))
        assert(small.columns.toSeq == Seq("o_orderkey", "o_custkey", "o_orderstatus"))
        assert(big.count() + small.count() == src.count())
      } finally { src.unpersist(); () }
    }
  }

  test("compressed columnar output (SequenceFile successor): zstd parquet round-trips") {
    withTempDir("graft_zstd_") { dir =>
      val src = Tables.nation(spark, sfDir)
      src.write.mode("overwrite").option("compression", "zstd").parquet(dir)
      val back = spark.read.parquet(dir)
      assert(back.count() == src.count())
      val file = new java.io.File(dir).listFiles().find(_.getName.endsWith(".parquet")).get
      assert(file.getName.contains("zstd"))
    }
  }

  test("CombineFile behavior: many small text files pack into fewer splits") {
    withTempDir("graft_combine_") { dir =>
      Tables.documents(spark, sfDir)
        .select(concat_ws("\t", col("doc_id"), col("text")).as("value"))
        .repartition(16)
        .write.mode("overwrite").text(dir)
      val files = new java.io.File(dir).listFiles().count(_.getName.startsWith("part-"))
      assert(files == 16)
      // Default openCostInBytes/maxPartitionBytes pack the 16 tiny
      // files into far fewer read splits — CombineFileInputFormat's
      // whole purpose — while a tiny maxPartitionBytes forces per-file
      // (or finer) splits, the NLineInputFormat direction.
      val combined = spark.read.text(dir).rdd.getNumPartitions
      assert(combined < files, s"expected <$files combined splits, got $combined")
      val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
      val prevCost = spark.conf.get("spark.sql.files.openCostInBytes")
      try {
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
        val fine = spark.read.text(dir).rdd.getNumPartitions
        assert(fine >= files, s"expected ≥$files fine splits, got $fine")
      } finally {
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
        spark.conf.set("spark.sql.files.openCostInBytes", prevCost)
      }
    }
  }

  test("gzip text output: non-splittable — one split per file regardless of split tuning") {
    withTempDir("graft_gzip_") { dir =>
      Tables.documents(spark, sfDir)
        .select(concat_ws("\t", col("doc_id"), col("text")).as("value"))
        .repartition(4)
        .write.mode("overwrite").option("compression", "gzip").text(dir)
      val parts = new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("part-"))
      assert(parts.length == 4)
      assert(parts.forall(_.getName.endsWith(".gz")), "codec suffix missing")
      // A maxPartitionBytes small enough to fracture the plain-text
      // layout into many splits (see the CombineFile test) cannot
      // split a gzip stream: each .gz file is one task, so the honest
      // split count equals the file count — the file count IS the
      // parallelism knob for non-splittable codecs.
      val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
      val prevCost = spark.conf.get("spark.sql.files.openCostInBytes")
      try {
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
        val splits = spark.read.text(dir).rdd.getNumPartitions
        assert(splits == parts.length,
          s"gzip must read one split per file: $splits splits for ${parts.length} files")
      } finally {
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
        spark.conf.set("spark.sql.files.openCostInBytes", prevCost)
      }
      // And the content round-trips exactly (same summary the oracle
      // hash-checks at the driver gate).
      val back = graft.sources.FileRoundTrips.gzipTextRoundTrip(spark, sfDir).collect().head
      val n = Tables.documents(spark, sfDir).count()
      assert(back.getLong(0) == n)
    }
  }

  test("bzip2 text output: splittable codec — split tuning CAN fracture the files") {
    // The counterpoint to the gzip test: bzip2 streams restart at
    // block markers, so the text source may plan multiple splits per
    // .bz2 file — the codec choice, not the container, decides
    // whether file count caps read parallelism.
    withTempDir("graft_bzip2_") { dir =>
      Tables.documents(spark, sfDir)
        .select(concat_ws("\t", col("doc_id"), col("text")).as("value"))
        .repartition(2)
        .write.mode("overwrite").option("compression", "bzip2").text(dir)
      val parts = new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("part-"))
      assert(parts.length == 2)
      assert(parts.forall(_.getName.endsWith(".bz2")), "codec suffix missing")
      val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
      val prevCost = spark.conf.get("spark.sql.files.openCostInBytes")
      try {
        spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
        spark.conf.set("spark.sql.files.openCostInBytes", "0")
        val splits = spark.read.text(dir).rdd.getNumPartitions
        assert(splits > parts.length,
          s"bzip2 is splittable: expected >${parts.length} planned splits, got $splits")
        // And no row is lost or doubled across the split seams.
        assert(spark.read.text(dir).count() ==
          Tables.documents(spark, sfDir).count())
      } finally {
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
        spark.conf.set("spark.sql.files.openCostInBytes", prevCost)
      }
    }
  }

  test("SequenceFile round-trip preserves every record through the K/V container") {
    val back = graft.sources.FileRoundTrips.sequenceFileRoundTrip(spark, sfDir)
      .collect().head
    val src = Tables.documents(spark, sfDir)
      .agg(count(lit(1)), sum(length(col("text"))), min(col("doc_id")), max(col("doc_id")))
      .collect().head
    assert(back == src)
  }

  test("Avro object-container round-trip preserves every record (avro-mapred formats)") {
    val back = graft.sources.FileRoundTrips.avroRoundTrip(spark, sfDir)
      .collect().head
    val src = Tables.documents(spark, sfDir)
      .agg(count(lit(1)), sum(length(col("text"))), min(col("doc_id")), max(col("doc_id")))
      .collect().head
    assert(back == src)
    // The sink really wrote Avro object-container files (magic "Obj\x01").
    val out = new java.io.File(
      graft.sources.FileRoundTrips.scratch("avro", sfDir))
    val parts = out.listFiles().filter(_.getName.startsWith("part-"))
    assert(parts.nonEmpty)
    val magic = new Array[Byte](4)
    val in = new java.io.FileInputStream(parts.head)
    try in.read(magic) finally in.close()
    assert(magic.sameElements(Array('O'.toByte, 'b'.toByte, 'j'.toByte, 1.toByte)),
      s"not an Avro container: ${magic.mkString(",")}")
  }

  test("CombineFile/NLine analogue: maxPartitionBytes controls split count") {
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "65536") // 64 KB
      val many = Tables.lineitem(spark, sfDir).rdd.getNumPartitions
      spark.conf.set("spark.sql.files.maxPartitionBytes", "1073741824")
      val few = Tables.lineitem(spark, sfDir).rdd.getNumPartitions
      assert(many > few, s"expected more splits at 64KB ($many) than 1GB ($few)")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("bucketed tables co-locate the join: no Exchange in the plan") {
    import org.apache.spark.sql.functions.count
    Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
      .write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
      .write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bucketed")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
      val plan = explainString(joined)
      assert(!plan.contains("Exchange"),
        "bucketed join must not shuffle:\n" + plan.take(2000))
      assert(joined.agg(count(lit(1))).collect().head.getLong(0) ==
        Tables.lineitem(spark, sfDir)
          .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
          .count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("csv round-trip preserves hostile payloads: quotes, commas, edge whitespace") {
    import spark.implicits._
    withTempDir("graft_csv_") { dir =>
      val hostile = Seq(
        (1L, "plain text"),
        (2L, "comma, separated, payload"),
        (3L, "a \"quoted\" phrase"),
        (4L, "  leading and trailing  "),
        (5L, "quote-comma \",\" mix"),
        (6L, "unicode: żółć 漢字 émoji"),
        (7L, ""))
      val back = graft.sources.FileRoundTrips
        .csvRoundTripOf(hostile.toDF("doc_id", "text"), dir)
        .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      hostile.foreach { case (id, t) =>
        // Spark's CSV reader cannot distinguish a written empty string
        // from null (both round-trip as null) — that one collapse is
        // the format's documented limit; everything else must be exact.
        val expect = if (t.isEmpty) None else Some(t)
        assert(back(id) == expect, s"doc $id: ${back(id)} vs $expect")
      }
    }
  }

  test("bucketed_join operator: join side reads buckets, only the agg exchanges") {
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = graft.sources.FileRoundTrips.bucketedJoin(spark, sfDir)
      val plan = explainString(df)
      val n = """Exchange \(\d+\)""".r.findAllIn(plan).size
      assert(n == 1, s"expected only the aggregation exchange, saw $n\n${plan.take(3000)}")
      assert(plan.contains("Bucketed: true"), plan.take(3000))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("partitioned layout: static predicates prune at plan time, dim filters prune dynamically") {
    val pdir = graft.sources.FileRoundTrips.partitionedEventsDir(spark, sfDir) + "/fact"
    val parts = new java.io.File(pdir).listFiles()
      .filter(_.getName.startsWith("event_type=")).map(_.getName).toSet
    assert(parts.size == 5, s"one directory per event type: $parts")
    // Static face: a literal partition predicate lands in
    // PartitionFilters — pruning happens at file listing, zero bytes
    // of other partitions are read.
    val statPlan = explainString(
      spark.read.parquet(pdir).filter(col("event_type") === "click"))
    assert(statPlan.contains("PartitionFilters") && statPlan.contains("event_type"),
      statPlan.take(2000))
    // Dynamic face: the dim-side filter becomes a runtime
    // dynamicpruning expression in the fact scan.
    val dynPlan = explainString(
      graft.sources.FileRoundTrips.partitionPruneJoin(spark, sfDir))
    assert(dynPlan.toLowerCase.contains("dynamicpruning"), dynPlan.take(3000))
    // The layout preserves every row.
    assert(spark.read.parquet(pdir).count() == Tables.events(spark, sfDir).count())
  }

  test("AQE skew join engages: a hot key's partition is split at runtime") {
    // Skew.scala's first line of defense is AQE's runtime skew split
    // (salting is the plan-level fallback) — prove the claimed path
    // actually fires. Synthetic skew: 90% of the left rows share one
    // key with a ~100-byte payload; thresholds lowered so the hot
    // partition is flagged and split; broadcast disabled so the join
    // stays sort-merge (AQE skew handling targets SMJ/SHJ).
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16384",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val pad = "x" * 100
      val left = spark.range(20000)
        .select(when(col("id") % 10 =!= 0, 0L).otherwise(col("id")).as("k"),
          concat(col("id").cast("string"), lit(pad)).as("payload"))
      val right = spark.range(64).select(col("id").as("k"), lit(1).as("dim"))
      val joined = left.join(right, "k")
      // collect() drives joined's OWN QueryExecution (count() would
      // build a separate one and leave this plan un-finalized).
      assert(joined.collect().length == 18000 + 64 / 10 + 1)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        "AQE did not mark the hot partition as skewed:\n" + finalPlan.take(2000))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("saltedJoin returns exactly the rows of the plain join") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
    val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy().agg(count(lit(1)), round(sum(col("l_quantity") * col("o_totalprice")), 0))
      .collect().head
    val salted = Skew.saltedJoin(li, o, col("l_orderkey"), col("o_orderkey"), 8)
      .groupBy().agg(count(lit(1)), round(sum(col("l_quantity") * col("o_totalprice")), 0))
      .collect().head
    assert(plain == salted)
  }
}
