package graft

import graft.functions.TextFunctions
import graft.operators.{Multimodal, TextAnalysis}
import org.apache.spark.sql.functions._

class TextMultimodalSpec extends SparkSpecBase {

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
