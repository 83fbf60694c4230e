package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpecBase {

  test("decontaminate: benchmark docs excluded, flags consistent, hits exist") {
    val rows = Curation.decontaminate(spark, sfDir).collect()
    assert(rows.forall(r => r.getLong(0) % Curation.BenchMod != 0),
      "benchmark docs must not appear in the corpus-side output")
    rows.foreach { r =>
      assert(r.getInt(1) >= 0)
      assert(r.getBoolean(2) == (r.getInt(1) > 0))
    }
    // The synthetic corpus plants near-dups across the mod boundary —
    // a decontamination pass that never fires is vacuous.
    assert(rows.count(_.getBoolean(2)) > 0, "expected ≥1 contaminated doc")
  }

  test("decontaminate_bloom: result identical to the exact join; bloom probe in the plan") {
    val exact = Curation.decontaminate(spark, sfDir)
      .orderBy(col("doc_id")).collect().toSeq
    val bloomed = Curation.decontaminateBloom(spark, sfDir)
      .orderBy(col("doc_id")).collect().toSeq
    // The bloom tier is a PRE-prune: false positives die in the exact
    // join, false negatives are impossible — results must be equal.
    assert(bloomed == exact)
    val plan = explainString(Curation.decontaminateBloom(spark, sfDir))
    assert(plan.contains("might_contain"), plan.take(2000))
    // The probe must run UPSTREAM of the gram equality join (a prune
    // after the join would be decorative). Formatted-plan node ids
    // increase from leaves to root, so the Filter detail block
    // carrying might_contain must have a smaller id than every inner
    // hash join.
    val probeId = "\\((\\d+)\\) Filter\\b[\\s\\S]{0,500}?might_contain".r
      .findFirstMatchIn(plan).map(_.group(1).toInt)
    val joinIds = "\\((\\d+)\\) BroadcastHashJoin\\b".r
      .findAllMatchIn(plan).map(_.group(1).toInt).toSeq
    assert(probeId.nonEmpty, "no Filter node carries might_contain")
    assert(joinIds.nonEmpty)
    assert(probeId.get < joinIds.min,
      s"bloom probe (node ${probeId.get}) must sit below the joins ($joinIds)")
  }

  test("dup_ngram_profile: bounded, and exact-duplicate docs score 1.0") {
    val prof = Curation.dupNgramProfile(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    prof.values.foreach { case (n, d, f) =>
      assert(d >= 0 && d <= n)
      assert(f >= 0.0 && f <= 1.0)
    }
    assert(prof.values.exists(_._3 > 0.0), "planted dups should share grams")
    // Every gram of an exact-duplicate doc also occurs in its twin →
    // dup_frac must be exactly 1.0 for BOTH members of an md5
    // identity group of size ≥ 2. (sf0.001 plants no exact dups —
    // the set is then empty and only the bounds above apply.)
    val groups = graft.operators.Dedup.exact(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(3))) // (doc_id, n_copies)
      .filter(_._2 >= 2).map(_._1).toSet
    groups.flatMap(prof.get).foreach { case (_, _, f) => assert(f == 1.0) }
  }

  test("split_assign: same source always lands in one split, bounds hold") {
    val df = Curation.splitAssign(spark, sfDir)
    val rows = df.collect()
    rows.foreach { r =>
      val b = r.getInt(2)
      assert(b >= 0 && b < 100)
      val expect = if (b < Curation.TrainPct) "train"
        else if (b < Curation.ValPct) "val" else "test"
      assert(r.getString(3) == expect)
    }
    val leaky = df.groupBy(col("source"))
      .agg(countDistinct(col("split")).as("n")).filter(col("n") > 1).count()
    assert(leaky == 0, "a source straddling splits = train/eval leakage")
  }

  test("shuffle_shards: positions are a contiguous 1..n_shard per shard") {
    val df = Curation.shuffleShards(spark, sfDir)
    val bad = df.groupBy(col("shard"))
      .agg(count(lit(1)).as("n"), max(col("pos_in_shard")).as("mx"),
        min(col("pos_in_shard")).as("mn"),
        countDistinct(col("pos_in_shard")).as("nd"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1 || col("nd") =!= col("n"))
    assert(bad.count() == 0)
    assert(df.select(col("shard")).distinct().count() == Curation.NumShards)
    // Determinism: a re-run yields the identical assignment.
    val again = Curation.shuffleShards(spark, sfDir)
    assert(df.exceptAll(again).count() == 0)
  }

  test("sample_reservoir: per-stratum size = min(N, stratum size), plan keeps top-k map-side") {
    val perSource = Tables.documents(spark, sfDir)
      .groupBy(col("source")).agg(count(lit(1)).as("total"))
    val got = Curation.sampleReservoir(spark, sfDir)
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
    val bad = got.join(perSource, "source")
      .filter(col("n") =!= least(lit(Curation.ReservoirN), col("total")))
    assert(bad.count() == 0)
    val plan = explainString(Curation.sampleReservoir(spark, sfDir))
    assert(plan.contains("WindowGroupLimit"),
      "rank filter must push a map-side top-N:\n" + plan.take(1500))
  }

  test("tfidf_topterms: ranks contiguous from 1, scores positive and non-increasing") {
    val rows = Curation.tfidfTopTerms(spark, sfDir)
      .orderBy(col("doc_id"), col("rk")).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val ranks = rs.map(_.getInt(1)).toSeq
      assert(ranks == (1 to ranks.size), s"ranks $ranks not contiguous")
      val scores = rs.map(_.getDouble(3)).toSeq
      assert(scores.forall(_ > 0.0))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("corpus_curate: dispositions partition the corpus, keeps exist") {
    val rows = Curation.corpusCurate(spark, sfDir).collect()
    val valid = Set("keep", "dup", "contaminated", "low_quality")
    rows.foreach(r => assert(valid.contains(r.getString(1))))
    val total = rows.map(_.getLong(2)).sum
    val corpus = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % Curation.BenchMod =!= 0).count()
    assert(total == corpus, "every corpus doc gets exactly one disposition")
    assert(rows.filter(_.getString(1) == "keep").map(_.getLong(2)).sum > 0)
  }

  test("corpus_curate plan: no required shuffle carries the document text") {
    // The keeper window's shuffle input must be the projected
    // (doc_id, source, md5, qual) rows — same no-text-shuffle rule
    // Dedup.exact plan-asserts. Scan EVERY Exchange node's own detail
    // block: any shuffle the plan REQUIRES (ENSURE_REQUIREMENTS — a
    // window/join/agg key exchange) must not list `text`. The only
    // exemption is Tables.spread's explicit REPARTITION_BY_NUM — the
    // documented CPU-parallelism seam for single-split test inputs,
    // which a 100 TB multi-file scan layout makes a no-op.
    val plan = explainString(Curation.corpusCurate(spark, sfDir))
    val lines = plan.linesIterator.toVector
    val starts = lines.zipWithIndex.collect {
      case (l, i) if "^\\(\\d+\\) Exchange\\b".r.findFirstIn(l).isDefined => i
    }
    assert(starts.nonEmpty, plan.take(2500))
    var checked = 0
    starts.foreach { i =>
      val block = lines.drop(i + 1).takeWhile(l => "^\\(\\d+\\) ".r.findFirstIn(l).isEmpty)
      val explicitSpread = block.exists(_.contains("REPARTITION_BY_NUM"))
      if (!explicitSpread) {
        checked += 1
        block.filter(_.trim.startsWith("Input")).foreach { inputLine =>
          assert(!inputLine.contains("text"),
            s"required Exchange at plan line $i shuffles document text: $inputLine")
        }
      }
    }
    assert(checked > 0, "expected at least one required Exchange to check")
  }

  test("line dedup: multi-line semantics — boilerplate stripped, order kept, empties ignored") {
    // Real '\n'-framed documents (the registered queries re-line the
    // single-line synthetic corpus; the operator CORE must handle the
    // general case): a boilerplate footer shared by 3 docs, a line
    // repeated WITHIN one doc, empty lines, and a doc that is 100%
    // boilerplate.
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha one\nCOMMON FOOTER\n\nunique to one"),
      (2L, "beta two\nCOMMON FOOTER\nbeta again\nbeta again"),
      (3L, "COMMON FOOTER"),
      (4L, ""),
      (5L, "solo doc, nothing shared")
    ).toDF("doc_id", "text")
    val prof = Curation.lineProfileOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // Empty lines never count; within-doc repeats ARE duplicates
    // (df ≥ 2 corpus-wide, same rule CCNet applies).
    assert(prof(1L) == ((3L, 1L, 0.3333)))
    assert(prof(2L) == ((4L, 3L, 0.75)))
    assert(prof(3L) == ((1L, 1L, 1.0)))
    assert(!prof.contains(4L), "a doc with no non-empty lines has no profile row")
    assert(prof(5L) == ((1L, 0L, 0.0)))

    val strip = Curation.lineStripOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    // Kept text preserves original line order; EVERY copy of a
    // duplicated line dies (strictest CCNet variant); empty docs and
    // all-boilerplate docs collapse to md5("").
    assert(strip(1L) == ((3, 2, md5hex("alpha one\nunique to one"))))
    assert(strip(2L) == ((4, 1, md5hex("beta two"))))
    assert(strip(3L) == ((1, 0, md5hex(""))))
    assert(strip(4L) == ((0, 0, md5hex(""))))
    assert(strip(5L) == ((1, 1, md5hex("solo doc, nothing shared"))))
  }

  test("line dedup: strip complements profile; corpus exercise is non-degenerate") {
    // n_kept counts df < 2 lines, n_dup_lines counts df ≥ 2 — exact
    // complements over each doc's non-empty lines, across the two
    // independent plans.
    val prof = Curation.lineDedupProfile(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val strip = Curation.lineDedupStrip(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    prof.foreach { case (id, (nLines, nDup)) =>
      val (sLines, sKept) = strip(id)
      assert(sLines.toLong == nLines, s"doc $id line counts disagree")
      assert(sKept.toLong == nLines - nDup, s"doc $id kept != lines - dups")
    }
    // Docs absent from the profile (no non-empty lines) must report
    // 0/0 in the strip's full-corpus face.
    strip.filterNot { case (id, _) => prof.contains(id) }
      .foreach { case (_, (l, k)) => assert(l == 0 && k == 0) }
    // The planted near-dups share aligned token windows → the df
    // branch must actually fire on the corpus (a line-dedup pass that
    // never strips anything is vacuous).
    assert(prof.values.exists(_._2 > 0), "expected ≥1 duplicated line in the corpus")
  }

  test("dedup_manifest: dispositions partition the corpus and agree with both tiers") {
    val rows = Curation.dedupManifest(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val corpus = Tables.documents(spark, sfDir).count()
    assert(rows.size.toLong == corpus, "one disposition per doc")
    // Exact tier: every non-keeper of an md5 group is dup_exact.
    val exactDups = graft.operators.Dedup.exact(spark, sfDir).collect()
      .filter(r => r.getLong(0) != r.getLong(1)).map(_.getLong(0)).toSet
    exactDups.foreach(id => assert(rows(id) == "dup_exact"))
    // Near tier: cluster members that are not their keeper and not
    // exact dups are dup_near; keepers keep.
    val keepers = Curation.keeperSelect(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    graft.operators.Dedup.clusters(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).foreach { case (id, cl) =>
        val expected =
          if (exactDups.contains(id)) "dup_exact"
          else if (id != keepers(cl)) "dup_near"
          else "keep"
        assert(rows(id) == expected, s"doc $id in cluster $cl: ${rows(id)} != $expected")
      }
    assert(rows.values.exists(_ == "keep"))
  }

  test("mix_execute: executed token mass tracks each language's declared target") {
    val plan = Curation.mixPlan(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(4), r.getDouble(5)))).toMap // (target_tokens, rf)
    val exec = Curation.mixExecute(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    exec.foreach { case (lang, (nDocs, nCopies, tokens)) =>
      val (target, rf) = plan(lang)
      assert(nDocs > 0)
      if (rf == 0.0) assert(nCopies == 0 && tokens == 0)
      else {
        // E[executed] = rf · corpus tokens = target (by construction);
        // the per-doc hash coin adds bounded sampling noise.
        val err = math.abs(tokens - target).toDouble / target
        assert(err < 0.15, s"$lang executed $tokens vs target $target (err $err)")
        // floor(rf) epochs are guaranteed: every doc has ≥ floor(rf) copies.
        assert(nCopies >= math.floor(rf).toLong * nDocs)
      }
    }
  }

  test("mix_by_cluster: budget recovered, temperature flattens shares toward small clusters") {
    try {
      val rows = Curation.mixByCluster(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getLong(4), r.getLong(5)))
      assert(rows.nonEmpty)
      // E[Σ executed] = Σ_c rf_c · tokens_c = budget (up to the rf
      // rounding and per-doc coin noise).
      val executed = rows.map(_._6).sum
      val err = math.abs(executed - Curation.MixBudgetTokens).toDouble /
        Curation.MixBudgetTokens
      assert(err < 0.15, s"executed $executed vs budget ${Curation.MixBudgetTokens}")
      // floor(rf) epochs guaranteed per doc
      rows.foreach { case (_, nDocs, _, rf, nCopies, _) =>
        assert(nCopies >= math.floor(rf).toLong * nDocs) }
      // α = 1/2 damping: the token-richest cluster's executed share
      // must come DOWN from its raw share, the poorest cluster's up —
      // the whole point of temperature mixing.
      val totTok = rows.map(_._3).sum.toDouble
      val sharable = rows.filter(r => r._3 > 0 && r._6 > 0)
      if (sharable.length >= 2) {
        val big = sharable.maxBy(_._3)
        val small = sharable.minBy(_._3)
        if (big._3 != small._3) {
          def rawShare(r: (Long, Long, Long, Double, Long, Long)) = r._3 / totTok
          def execShare(r: (Long, Long, Long, Double, Long, Long)) =
            r._6.toDouble / executed
          assert(execShare(big) < rawShare(big),
            s"big cluster must be damped: exec ${execShare(big)} raw ${rawShare(big)}")
          assert(execShare(small) > rawShare(small),
            s"small cluster must be boosted: exec ${execShare(small)} raw ${rawShare(small)}")
        }
      }
    } finally graft.operators.Dedup.clearCaches()
  }

  test("line dedup: randomized corpora match a naive reference; strip is idempotent") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // A tiny line vocabulary forces heavy duplication — every code
    // path (all-dup docs, empty lines, within-doc repeats) gets hit.
    val vocab = Vector("alpha", "beta gamma", "d d d", "", "eps", "zeta eta")
    (1 to 3).foreach { _ =>
      val docs = (0L until 12L).map { id =>
        (id, Seq.fill(rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size))).mkString("\n"))
      }
      // Driver-side reference: corpus-wide occurrence counts over
      // non-empty lines; keep lines with df < 2.
      val allLines = docs.flatMap(_._2.split("\n", -1).filter(_.nonEmpty))
      val dfreq = allLines.groupBy(identity).view.mapValues(_.size).toMap
      val refKept = docs.map { case (id, t) =>
        id -> t.split("\n", -1).filter(_.nonEmpty).filter(l => dfreq(l) < 2)
      }.toMap
      val got = Curation.lineStripOf(docs.toDF("doc_id", "text")).collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
      docs.foreach { case (id, t) =>
        val ref = refKept(id)
        val nLines = t.split("\n", -1).count(_.nonEmpty)
        assert(got(id) == ((nLines, ref.length, md5hex(ref.mkString("\n")))),
          s"doc $id: got ${got(id)}, ref (${nLines}, ${ref.length})")
      }
      // Idempotence: every surviving line had df == 1 and no copy of
      // it was removed elsewhere, so a second pass strips nothing.
      val once = docs.map { case (id, _) => (id, refKept(id).mkString("\n")) }
      val twice = Curation.lineStripOf(once.toDF("doc_id", "text")).collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
      once.foreach { case (id, t) =>
        val ls = t.split("\n", -1).filter(_.nonEmpty)
        assert(twice(id) == ((ls.length, ls.length, md5hex(ls.mkString("\n")))),
          s"strip not idempotent for doc $id")
      }
    }
  }

  test("line_dedup_strip plan: text is rewritten map-side — no required shuffle carries it") {
    // Same no-text-shuffle rule corpus_curate asserts: the df/join
    // exchanges carry only (doc_id, line_no, h) rows, the dup
    // line-number relation is broadcast, and the rewrite runs inside
    // the scan's codegen stage. Only Tables.spread's explicit
    // REPARTITION_BY_NUM (the single-split CPU seam) may move text.
    val plan = explainString(Curation.lineDedupStrip(spark, sfDir))
    val lines = plan.linesIterator.toVector
    val starts = lines.zipWithIndex.collect {
      case (l, i) if "^\\(\\d+\\) Exchange\\b".r.findFirstIn(l).isDefined => i
    }
    assert(starts.nonEmpty, plan.take(2500))
    var checked = 0
    starts.foreach { i =>
      val block = lines.drop(i + 1).takeWhile(l => "^\\(\\d+\\) ".r.findFirstIn(l).isEmpty)
      if (!block.exists(_.contains("REPARTITION_BY_NUM"))) {
        checked += 1
        block.filter(_.trim.startsWith("Input")).foreach { inputLine =>
          assert(!inputLine.contains("text") && !inputLine.contains("line#"),
            s"required Exchange at plan line $i shuffles text: $inputLine")
        }
      }
    }
    assert(checked > 0, "expected at least one required Exchange to check")
    assert(plan.contains("BroadcastExchange"),
      "dup line-number relation must broadcast:\n" + plan.take(1500))
  }

  test("dedup_manifest: serves the merge from the persisted tier index, zero tier jobs") {
    // First call builds the parquet tier index (exact/labels/keepers —
    // the once-per-pipeline materialization); after that, CONSTRUCTING
    // the manifest plan must launch zero Spark jobs: no exact window,
    // no cluster fixpoint, no keeper arg-max, not even schema
    // inference (explicit schemas on all three index reads). Same
    // build/serve contract ann_ivf_serve pins.
    Curation.dedupManifest(spark, sfDir).count()
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
      val plan = explainString(Curation.dedupManifest(spark, sfDir))
      org.apache.spark.graft.TestBus.drain(sc)
      assert(jobs.get == 0, s"manifest-plan construction launched ${jobs.get} jobs")
      assert(plan.contains("deduptiers"),
        "manifest plan must scan the persisted tier index:\n" + plan.take(1500))
      assert(!plan.contains("md5"),
        "tier computation (md5 hashing) leaked into the serve plan")
    } finally sc.removeSparkListener(listener)
  }

  test("span dedup: planted spans — cross-doc, within-doc, sub-gram docs") {
    import spark.implicits._
    // doc 0 and doc 1 share the 5-token span "cc dd ee ff gg" inside
    // otherwise-unique prose; doc 2 repeats a 5-token span WITHIN
    // itself (suffix-array semantics: that counts); doc 3 is below
    // the gram width (nothing strippable).
    val docs = Seq(
      (0L, "aa bb cc dd ee ff gg hh ii"),
      (1L, "xx yy cc dd ee ff gg zz ww"),
      (2L, "p q r s t p q r s t u"),
      (3L, "short doc")).toDF("doc_id", "text")
    val strip = Curation.spanStripOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(strip(0L) == ((9, 4, md5hex("aa bb hh ii"))))
    assert(strip(1L) == ((9, 4, md5hex("xx yy zz ww"))))
    assert(strip(2L) == ((11, 1, md5hex("u"))))
    assert(strip(3L) == ((2, 2, md5hex("short doc"))))
    val prof = Curation.spanProfileOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getDouble(3)))).toMap
    assert(prof(0L) == ((9, 5, 0.5556)))
    assert(prof(1L) == ((9, 5, 0.5556)))
    assert(prof(2L) == ((11, 10, 0.9091)))
    assert(prof(3L) == ((2, 0, 0.0)))
  }

  test("span_dedup_exact: catches sub-GramW spans the token tier misses; equals naive reference") {
    import spark.implicits._
    // The exact tier's reason to exist: a repeated span of 2-4 TOKENS
    // never covers a GramW=5-token window, so the positional-gram
    // tier is blind to it — but at >= SpanMinChars characters the
    // char-window tier catches it (the Lee et al. suffix-array
    // semantics). Docs 10/11 share a 3-token 35-char span; doc 13
    // repeats a 2-token 42-char span WITHIN itself; doc 12 is clean.
    val docs = Seq(
      (10L, "alpha beta hippopotamus quantization overdrive gamma delta"),
      (11L, "omega psi hippopotamus quantization overdrive chi phi"),
      (12L, "completely unrelated filler words here nothing repeats at all"),
      (13L, "n1 n2 magnetohydrodynamics electroencephalograph magnetohydrodynamics electroencephalograph tail"))
    val mc = Curation.SpanMinChars
    // naive reference: every char window, exact substring counts,
    // covered = union of duplicated windows (ASCII corpus, so
    // UTF-16 substring == codepoint substring)
    val wins = docs.flatMap { case (id, t) =>
      (0 to t.length - mc).map(p => (id, p, t.substring(p, p + mc))) }
    val cnt = wins.groupBy(_._3).view.mapValues(_.size).toMap
    val expCov = wins.filter(w => cnt(w._3) >= 2).groupBy(_._1).view
      .mapValues(ws => ws.flatMap(w => w._2 until w._2 + mc).distinct.size).toMap
    val got = Curation.spanExactProfileOf(docs.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getDouble(3)))).toMap
    docs.foreach { case (id, t) =>
      val nd = expCov.getOrElse(id, 0)
      val frac = BigDecimal(nd.toDouble / t.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(id) == ((t.length, nd, frac)), s"doc $id: ${got(id)} want ($nd)")
    }
    // the planted sub-GramW spans ARE caught by the exact tier...
    assert(got(10L)._2 >= 35 && got(11L)._2 >= 35 && got(13L)._2 >= 42)
    assert(got(12L)._2 == 0, "clean doc falsely flagged")
    // ...and ARE missed by the token-positional approximation
    val tokProf = Curation.spanProfileOf(docs.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(Seq(10L, 11L, 13L).forall(tokProf(_) == 0),
      s"token tier unexpectedly caught a sub-GramW span: $tokProf")
  }

  test("span_dedup_exact_strip: kept text equals the naive uncovered-position rewrite") {
    import spark.implicits._
    val docs = Seq(
      (10L, "alpha beta hippopotamus quantization overdrive gamma delta"),
      (11L, "omega psi hippopotamus quantization overdrive chi phi"),
      (12L, "completely unrelated filler words here nothing repeats at all"),
      (13L, "n1 n2 magnetohydrodynamics electroencephalograph magnetohydrodynamics electroencephalograph tail"),
      (14L, ""))
    val mc = Curation.SpanMinChars
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val wins = docs.flatMap { case (id, t) =>
      (0 to t.length - mc).map(p => (id, p, t.substring(p, p + mc))) }
    val cnt = wins.groupBy(_._3).view.mapValues(_.size).toMap
    val covSet = wins.filter(w => cnt(w._3) >= 2).groupBy(_._1).view
      .mapValues(_.flatMap(w => w._2 until w._2 + mc).toSet).toMap
    val got = Curation.spanExactStripOf(docs.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    docs.foreach { case (id, t) =>
      val cov = covSet.getOrElse(id, Set.empty[Int])
      val kept = t.indices.filterNot(cov).map(t.charAt).mkString
      assert(got(id) == ((t.length, kept.length, md5hex(kept))),
        s"doc $id: ${got(id)} want (${t.length}, ${kept.length})")
    }
    // the shared/within-doc spans really are stripped
    assert(got(10L)._2 < docs(0)._2.length && got(13L)._2 < docs(3)._2.length)
    // clean doc untouched; empty doc is the md5('') row
    assert(got(12L)._2 == docs(2)._2.length)
    assert(got(14L) == ((0, 0, md5hex(""))))
  }

  test("span dedup: randomized corpora match a naive reference; profile complements strip") {
    import spark.implicits._
    val w = Curation.GramW
    val rnd = new scala.util.Random(47)
    // A 4-token vocabulary makes repeated 5-grams near-certain, so
    // every code path (heavy overlap-merging, all-dup docs, short
    // docs, empty docs) gets exercised.
    val vocab = Vector("a", "b", "c", "d")
    (1 to 3).foreach { _ =>
      val docs = (0L until 12L).map { id =>
        (id, Seq.fill(rnd.nextInt(14))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      def toks(t: String): Vector[String] =
        t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toVector
      // Driver-side reference: corpus-wide occurrence counts of every
      // positional w-gram; covered = union of windows whose gram
      // occurs ≥ 2 times anywhere (within-doc repeats included).
      val cnt = docs.flatMap { case (_, t) =>
        val tk = toks(t)
        (0 to tk.length - w).map(i => tk.slice(i, i + w).mkString(" "))
      }.groupBy(identity).view.mapValues(_.size).toMap
      val ref = docs.map { case (id, t) =>
        val tk = toks(t)
        val covered = (0 to tk.length - w)
          .filter(p => cnt(tk.slice(p, p + w).mkString(" ")) >= 2)
          .flatMap(p => p until p + w).toSet
        id -> ((tk, tk.zipWithIndex.collect { case (x, i) if !covered(i) => x }))
      }.toMap
      val strip = Curation.spanStripOf(docs.toDF("doc_id", "text")).collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
      val prof = Curation.spanProfileOf(docs.toDF("doc_id", "text")).collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
      docs.foreach { case (id, _) =>
        val (tk, kept) = ref(id)
        assert(strip(id) == ((tk.length, kept.length, md5hex(kept.mkString(" ")))),
          s"doc $id: got ${strip(id)}, ref (${tk.length}, ${kept.length})")
        // Profile counts exactly the tokens strip removes. (No
        // idempotence claim, deliberately: stripping can join
        // previously-distant tokens into NEW repeated windows, so a
        // second pass may legitimately strip more — unlike line
        // dedup, where surviving lines stay intact.)
        assert(prof(id) == ((tk.length, tk.length - kept.length)))
      }
    }
  }

  test("span_dedup_strip plan: text consumed map-side — no required shuffle carries it") {
    // Same no-text-shuffle rule as line_dedup_strip one granularity
    // down: the df/join exchanges carry only (doc_id, pos, h) and
    // int-array rows; the covered-position relation is broadcast; the
    // rewrite (indexed token filter + rejoin) runs inside the scan's
    // codegen stage. Only Tables.spread's explicit REPARTITION_BY_NUM
    // (the single-split CPU seam) may move text.
    val plan = explainString(Curation.spanDedupStrip(spark, sfDir))
    val lines = plan.linesIterator.toVector
    val starts = lines.zipWithIndex.collect {
      case (l, i) if "^\\(\\d+\\) Exchange\\b".r.findFirstIn(l).isDefined => i
    }
    assert(starts.nonEmpty, plan.take(2500))
    var checked = 0
    starts.foreach { i =>
      val block = lines.drop(i + 1).takeWhile(l => "^\\(\\d+\\) ".r.findFirstIn(l).isEmpty)
      if (!block.exists(_.contains("REPARTITION_BY_NUM"))) {
        checked += 1
        block.filter(_.trim.startsWith("Input")).foreach { inputLine =>
          assert(!inputLine.contains("text") && !inputLine.contains("toks#"),
            s"required Exchange at plan line $i shuffles text: $inputLine")
        }
      }
    }
    assert(checked > 0, "expected at least one required Exchange to check")
    assert(plan.contains("BroadcastExchange"),
      "covered-position relation must broadcast:\n" + plan.take(1500))
  }

  test("pack_sequences: doc start positions tile each shard's token stream") {
    val rows = Curation.packSequences(spark, sfDir).collect()
      .map(r => (r.getInt(1), r.getLong(0), r.getInt(2), r.getInt(3)))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      // Replay the greedy layout in doc order (the operator's window
      // order is (md5-ord, doc_id); re-derive it from the data).
      val laid = Curation.shuffleShards(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      val order = laid.filter(_._2 == rs.head._1).sortBy(_._3).map(_._1)
      val nTok = rs.map(r => r._2 -> r._3).toMap
      val seqOf = rs.map(r => r._2 -> r._4).toMap
      var cum = 0L
      order.foreach { doc =>
        assert(seqOf(doc) == cum / Curation.SeqWindow,
          s"doc $doc starts at $cum, expected seq ${cum / Curation.SeqWindow}")
        cum += nTok(doc)
      }
    }
  }

  test("dedup_semantic: verifies exactly the LSH candidates that have embeddings") {
    import graft.operators.Dedup
    val pairs = Dedup.minhashLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val withEmb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val sem = Dedup.semantic(spark, sfDir).collect()
    assert(sem.nonEmpty)
    sem.foreach { r =>
      val (a, b, cos) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(pairs.contains((a, b)), "semantic rows must be LSH candidates")
      assert(cos >= -1.0001 && cos <= 1.0001)
    }
    assert(sem.length == pairs.count { case (a, b) =>
      withEmb.contains(a) && withEmb.contains(b) })
  }

  test("dedup_keeper: keeper belongs to its cluster and has the max length") {
    val labels = graft.operators.Dedup.clusters(spark, sfDir)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), length(col("text")).as("len"))
    val byCluster = labels.join(docs, "doc_id").collect()
      .groupBy(_.getLong(1))
      .view.mapValues(_.map(r => (r.getLong(0), r.getInt(2)))).toMap
    val keepers = Curation.keeperSelect(spark, sfDir).collect()
    assert(keepers.nonEmpty)
    keepers.foreach { k =>
      val members = byCluster(k.getLong(0))
      assert(k.getLong(1) == members.size)
      val (keeperDoc, keeperChars) = (k.getLong(2), k.getInt(3))
      assert(members.contains((keeperDoc, keeperChars)))
      assert(keeperChars == members.map(_._2).max)
      // tie-break: among max-length members, the lowest doc_id wins
      val best = members.filter(_._2 == keeperChars).map(_._1).min
      assert(keeperDoc == best)
    }
  }
}
