package graft

import graft.functions.TextFunctions
import graft.operators.{Multimodal, TextAnalysis}
import org.apache.spark.sql.functions._

class TextMultimodalSpec extends SparkSpecBase {

  test("multimodal_audio: windowed RMS matches an independent text-side reference") {
    import graft.operators.Multimodal
    val got = Multimodal.multimodalAudio(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.size == docs.length)
    docs.foreach { case (id, text) =>
      val w = Multimodal.AudioWindow
      // independent reference from the STRING (chars, not bytes —
      // equal for this ASCII corpus, which is the seam's contract)
      val rmss = text.grouped(w).filter(_.length == w).map { win =>
        math.sqrt(win.map(c => c.toInt.toDouble * c.toInt).sum / w)
      }.toSeq
      val (n, nw, ns, mean) = got(id)
      assert(n == text.length && nw == text.length / w)
      assert(ns == rmss.count(_ < Multimodal.SilenceRms), s"doc $id silence")
      if (rmss.isEmpty) assert(mean.isEmpty)
      else assert(math.abs(mean.get - rmss.sum / rmss.length) < 1e-3, s"doc $id mean")
    }
    // both branches real on this corpus: short docs yield NULL means
    assert(got.values.exists(_._4.isEmpty) && got.values.exists(_._4.nonEmpty))
  }

  test("corpus_divergence: Gibbs bound, TV range, exact vs naive smoothed reference") {
    import graft.operators.TextAnalysis
    val rows = TextAnalysis.corpusDivergence(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    // information inequalities: KL >= 0 both directions, TV in [0, 1]
    rows.foreach { case (lang, _, klF, klR, tv) =>
      assert(klF >= 0 && klR >= 0, s"$lang negative KL")
      assert(tv >= 0 && tv <= 1, s"$lang TV out of range")
    }
    // naive reference: smoothed unigram KL computed driver-side
    val toks = Tables.documents(spark, sfDir)
      .select("lang", "text").collect()
      .flatMap(r => r.getString(1).toLowerCase
        .split("[^a-z0-9]+").filter(_.nonEmpty).map(r.getString(0) -> _))
    val vocab = toks.map(_._2).distinct.sorted
    val v = vocab.length
    val total = toks.length.toLong
    rows.foreach { case (lang, nTerms, klF, klR, tv) =>
      assert(nTerms == v.toLong, s"$lang grid size")
      val in = toks.filter(_._1 == lang)
      val tIn = in.length.toLong
      val cIn = in.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val cAll = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val (f, r2, t) = vocab.foldLeft((BigDecimal(0), BigDecimal(0), BigDecimal(0))) {
        case ((af, ar, at), tok) =>
          val p = (cIn.getOrElse(tok, 0L) + 1).toDouble / (tIn + v)
          val q = (cAll(tok) - cIn.getOrElse(tok, 0L) + 1).toDouble / (total - tIn + v)
          def dec(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
          (af + dec(p * math.log(p / q)), ar + dec(q * math.log(q / p)),
            at + dec(math.abs(p - q)))
      }
      assert(math.abs(klF - (f.toDouble * 1e6).round / 1e6) < 1e-9, s"$lang kl_fwd")
      assert(math.abs(klR - (r2.toDouble * 1e6).round / 1e6) < 1e-9, s"$lang kl_rev")
      assert(math.abs(tv - (t.toDouble / 2 * 1e6).round / 1e6) < 1e-9, s"$lang tv")
    }
  }

  test("tokens splits on non-alnum and drops empties") {
    import spark.implicits._
    val got = Seq("Hello, World!  42x").toDF("text")
      .select(TextFunctions.tokens(col("text"))).collect().head.getSeq[String](0)
    assert(got == Seq("hello", "world", "42x"))
  }

  test("occurrences counts non-overlapping literal matches") {
    import spark.implicits._
    val got = Seq(" a b a b a ").toDF("t")
      .select(TextFunctions.occurrences(col("t"), " a ")).collect().head.getInt(0)
    // " a b a b a " -> matches at 0, 4, 8 (scan resumes after each match)
    assert(got == 3)
  }

  test("langid picks the language with the highest marker score") {
    val rows = TextAnalysis.langid(spark, sfDir).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val scores = Map(
        "en" -> r.getInt(1), "de" -> r.getInt(2), "fr" -> r.getInt(3),
        "es" -> r.getInt(4), "zh" -> r.getInt(5))
      val pred = r.getString(6)
      if (pred != "und") assert(scores(pred) == scores.values.max)
      else assert(scores.values.max == 0)
    }
  }

  test("gopher rule table: each rule's failure path fires on a crafted doc") {
    import spark.implicits._
    val keeperWords =
      ("the be to of and that have with " * 7).trim // 56 words, all rules pass
    val docs = Seq(
      0L -> keeperWords,
      1L -> "the be to of and short", // < 50 words
      2L -> Seq.fill(60)("a").mkString(" "), // mean word len < 3
      3L -> (keeperWords + " " + Seq.fill(20)("#").mkString(" ")), // symbols
      4L -> (0 until 10).map(i => s"- item $i bullet line here now yes").mkString("\n"), // bullets
      5L -> (keeperWords.split(' ').grouped(8).map(_.mkString(" ") + " ...").mkString("\n")), // ellipses
      6L -> ("the be " + Seq.fill(55)("12345").mkString(" ")), // alpha ratio < 0.8
      7L -> Seq.fill(60)("zebra").mkString(" ") // no stop words
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherQualityOf(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(0L).getBoolean(8), "keeper doc must pass every rule")
    (1L to 7L).foreach(i => assert(!got(i).getBoolean(8), s"doc $i must fail"))
    // the failing SIGNAL is the intended one
    assert(got(1L).getInt(1) < 50)
    assert(got(2L).getDouble(2) < 3.0)
    assert(got(3L).getDouble(3) > 0.1)
    assert(got(4L).getDouble(4) >= 0.9)
    assert(got(5L).getDouble(5) > 0.3)
    assert(got(6L).getDouble(6) < 0.8)
    assert(got(7L).getInt(7) < TextAnalysis.GopherMinStopHits)
    // empty doc: zero denominators guarded, not NaN
    val empty = TextAnalysis.gopherQualityOf(Seq(9L -> "").toDF("doc_id", "text"))
      .collect().head
    assert(empty.getInt(1) == 0 && !empty.getBoolean(8))
    assert(!empty.getDouble(2).isNaN && !empty.getDouble(4).isNaN)
  }

  test("quality buckets: terciles are ordered, near-equal sized, unscored iff sub-bigram") {
    try {
      val rows = TextAnalysis.lmBuckets(spark, sfDir).collect()
        .map(r => (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          r.getString(3)))
      val byBucket = rows.groupBy(_._3)
      // unscored ⇔ no score
      assert(byBucket.getOrElse("unscored", Array.empty).forall(_._2.isEmpty))
      Seq("head", "middle", "tail").foreach(b =>
        assert(byBucket.getOrElse(b, Array.empty).forall(_._2.nonEmpty)))
      // ordering: every head score ≤ every middle score ≤ every tail score
      def scores(b: String) = byBucket.getOrElse(b, Array.empty).flatMap(_._2)
      if (scores("head").nonEmpty && scores("middle").nonEmpty)
        assert(scores("head").max <= scores("middle").min)
      if (scores("middle").nonEmpty && scores("tail").nonEmpty)
        assert(scores("middle").max <= scores("tail").min)
      // tercile thresholds split the scored mass into rough thirds
      val scored = rows.count(_._2.nonEmpty)
      if (scored >= 30) Seq("head", "middle", "tail").foreach { b =>
        val frac = scores(b).length.toDouble / scored
        assert(frac > 0.2 && frac < 0.47, s"$b holds $frac of scored docs")
      }
    } finally graft.operators.Dedup.clearCaches()
  }

  test("lm_score: fluent corpus-typical docs beat junk; sub-bigram docs are NULL") {
    import spark.implicits._
    // Five docs share the same fluent pattern — their bigrams are
    // corpus-frequent; one junk doc is all singleton bigrams; one doc
    // is a single token (no bigrams at all).
    val docs = ((0L until 5L).map(i => (i, "the cat sat on the mat and the dog sat on the rug")) ++
      Seq((5L, "zq xv qj wk vn zz pq"), (6L, "hello"))).toDF("doc_id", "text")
    try {
      val got = TextAnalysis.lmScoreOf(docs).collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
      assert(got(6L) == ((1, 0L, None)), s"single-token doc: ${got(6L)}")
      val fluent = got(0L)._3.get
      val junk = got(5L)._3.get
      assert(fluent < junk, s"fluent $fluent should score below junk $junk")
      (1L until 5L).foreach(i => assert(got(i)._3.get == fluent))
    } finally graft.operators.Dedup.clearCaches()
  }

  test("lm_score: randomized corpora match a naive reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val vocabWords = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    for (round <- 0 until 3) {
      val docs = (0L until 40L).map { id =>
        val n = rnd.nextInt(12) // includes 0- and 1-token docs
        (id, Seq.fill(n)(vocabWords(rnd.nextInt(vocabWords.length))).mkString(" "))
      }
      // Naive reference: same tokenizer, same add-1/2 smoothing.
      val tok = docs.map { case (id, t) =>
        id -> t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      }.toMap
      val uni = tok.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bigs = tok.toSeq.flatMap { case (id, ts) => ts.zip(ts.drop(1)).map(b => (id, b)) }
      val bc = bigs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val v = uni.size.toLong
      val expect = tok.map { case (id, ts) =>
        val bs = ts.zip(ts.drop(1))
        val score =
          if (bs.isEmpty) None
          else Some(bs.map(b =>
            -math.log((bc(b) + 0.5) / (uni(b._1) + 0.5 * v))).sum / bs.length)
        id -> (ts.length, bs.length.toLong, score)
      }
      try {
        val got = TextAnalysis.lmScoreOf(docs.toDF("doc_id", "text")).collect()
          .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2),
            if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
        assert(got.keySet == expect.keySet)
        expect.foreach { case (id, (nt, nb, sc)) =>
          val (gnt, gnb, gsc) = got(id)
          assert(gnt == nt && gnb == nb, s"round $round doc $id: ($gnt,$gnb) vs ($nt,$nb)")
          (gsc, sc) match {
            case (None, None) =>
            case (Some(g), Some(e)) =>
              // Output is rounded to 4; naive is unrounded.
              assert(math.abs(g - e) <= 5.001e-5, s"round $round doc $id: $g vs $e")
            case other => fail(s"round $round doc $id: $other")
          }
        }
      } finally graft.operators.Dedup.clearCaches()
    }
  }

  test("text_readability: counts and Flesch equal a naive regex replay") {
    val got = TextAnalysis.readability(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
    assert(got.size == docs.length)
    docs.foreach { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      val words = text.toLowerCase.split("[^a-z0-9]+").count(_.nonEmpty)
      val sentences = math.max("[.!?]+".r.findAllIn(text).length, 1)
      val syll = "[aeiouy]+".r.findAllIn(text.toLowerCase).length
      val g = got(id)
      assert(g.getInt(1) == words && g.getInt(2) == sentences && g.getInt(3) == syll)
      if (words == 0) assert(g.isNullAt(4))
      else {
        val f = 206.835 - 1.015 * (words.toDouble / sentences) -
          84.6 * (syll.toDouble / words)
        assert(g.getDouble(4) ==
          BigDecimal(f).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
    // score must discriminate: the corpus spans a real range
    val scores = got.values.filterNot(_.isNullAt(4)).map(_.getDouble(4))
    assert(scores.max - scores.min > 10.0, s"degenerate range ${scores.min}..${scores.max}")
  }

  test("quality ratios are bounded and keep-flag matches its definition") {
    val rows = TextAnalysis.quality(spark, sfDir).collect()
    rows.foreach { r =>
      val (nChars, nToks) = (r.getInt(1), r.getInt(2))
      Seq(3, 4, 5).map(r.getDouble).foreach(x => assert(x >= 0.0 && x <= 1.0001))
      assert(r.getBoolean(6) == (nChars >= 50 && nToks >= 10))
    }
  }

  test("fingerprint min <= max over the shingle hashes") {
    val rows = TextAnalysis.fingerprint(spark, sfDir).collect()
    rows.foreach(r => assert(r.getString(1) <= r.getString(2)))
  }

  test("frame sampler cuts stride-aligned frames with correct sizes and digests") {
    import graft.operators.Multimodal
    // 2200 bytes → 3 frames at stride 1024: offsets 0/1024/2048,
    // sizes 256/256/152 — the tail frame ends 2048+152=2200, so the
    // truncate-at-media-end branch is actually exercised.
    val bytes = Array.tabulate(2200)(i => (i % 251).toByte)
    val frames = Multimodal.frameSampleStub(
      Iterator(Multimodal.MediaRow(7L, bytes))).toVector
    assert(frames.map(f => (f.frame_no, f.frame_offset, f.frame_bytes)) ==
      Vector((0, 0, 256), (1, 1024, 256), (2, 2048, 152)))
    val md = java.security.MessageDigest.getInstance("MD5")
    frames.foreach { f =>
      // Digest contract: md5 of the lowercase hex of the slice (the
      // cross-engine blob-hash formulation — see Multimodal scaladoc).
      md.reset()
      val hex = bytes.slice(f.frame_offset, f.frame_offset + f.frame_bytes)
        .map(b => "%02x".format(b)).mkString
      md.update(hex.getBytes("UTF-8"))
      assert(f.frame_md5 == md.digest().map(b => "%02x".format(b)).mkString)
    }
    // Empty media still yields exactly one (empty) frame.
    val empty = Multimodal.frameSampleStub(
      Iterator(Multimodal.MediaRow(8L, Array.empty[Byte]))).toVector
    assert(empty.map(f => (f.frame_no, f.frame_offset, f.frame_bytes)) ==
      Vector((0, 0, 0)))
  }

  test("multimodal_scenes: cuts equal a naive frame-hash replay; both branches exercised") {
    import graft.operators.Multimodal
    val naive = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect().map { r =>
        val frames = Multimodal.frameSampleWith(Iterator(
          Multimodal.MediaRow(r.getLong(0), r.getString(1).getBytes("UTF-8"))),
          Multimodal.SceneStride, Multimodal.SceneWidth).toVector
        val cuts = frames.sliding(2).collect {
          case Vector(a, b) if a.frame_md5 != b.frame_md5 => b.frame_offset
        }.toVector
        r.getLong(0) -> ((frames.size, cuts.size.toLong, cuts.sorted.mkString(",")))
      }.toMap
    val got = Multimodal.multimodalScenes(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getString(3)))).toMap
    assert(got == naive)
    // corpus property, pinned: single-frame docs exercise the no-cut
    // branch; multi-frame text media cuts at every boundary
    assert(got.values.exists(_._1 == 1) && got.values.exists(_._2 > 0))
    got.values.filter(_._1 > 1).foreach { case (nf, nc, _) =>
      assert(nc == nf - 1, "text-backed frames must all differ")
    }
  }

  test("multimodal decode stub: batch seam yields deterministic metadata") {
    val meta = Multimodal.multimodalMeta(spark, sfDir).collect()
    assert(meta.length == 500)
    meta.foreach { r =>
      val n = r.getInt(1)
      assert(r.getInt(2) == n % 640 + 1)
      assert(r.getInt(3) == (n * 7) % 480 + 1)
      assert(Set("jpeg", "png", "webp").contains(r.getString(4)))
    }
  }

  test("multimodal metadata extraction involves no shuffle") {
    val plan = explainString(Multimodal.multimodalMeta(spark, sfDir))
    assert(!plan.contains("Exchange"), "decode must stay map-only:\n" + plan.take(1500))
  }

  test("multimodal_frame_dedup: pair counts match a recomputation from the frame relation") {
    val frames = Multimodal.multimodalFrames(spark, sfDir)
      .select(col("doc_id"), col("frame_md5"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val expected = frames.groupBy(_._2).values
      .map(_.map(_._1).toSeq.sorted)
      .filter(ds => ds.size > 1 && ds.size <= Multimodal.HotFrameMax)
      .flatMap(ds => for (a <- ds; b <- ds if a < b) yield (a, b))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Multimodal.frameDedup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected)
    assert(got.nonEmpty, "planted near-dups should share frames")
  }
}
