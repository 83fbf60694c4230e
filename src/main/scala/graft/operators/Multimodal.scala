package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing (SURVEY §2.4 #47).
  *
  * Media payloads are opaque `binary` columns with typed metadata.
  * The decode/feature-extract step is a per-partition batch seam
  * (`mapPartitions` over a typed Dataset) — the Scala analogue of
  * Python's `mapInPandas` batch UDF shape. The actual image/audio
  * codecs are NOT present in this container, so [[decodeStub]] is a
  * clearly-marked deterministic fake; the Spark-side plumbing
  * (schema, encoders, batch iteration, partitioning) is real and is
  * what a 100 TB pipeline needs to get right: media bytes stay in
  * executor memory, are never shuffled (metadata is extracted before
  * any wide operation), and decode parallelism = input partitions.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media: Array[Byte])
  case class MediaMeta(doc_id: Long, n_bytes: Int, fake_width: Int,
      fake_height: Int, format: String)

  /** STUB decode: a real implementation would call an image codec
    * here (e.g. via JNI/javax.imageio); this fake derives
    * deterministic "dimensions" from the byte length so tests and
    * oracles can pin the pipeline down end-to-end. */
  def decodeStub(rows: Iterator[MediaRow]): Iterator[MediaMeta] =
    rows.map { r =>
      val n = r.media.length
      MediaMeta(
        doc_id = r.doc_id,
        n_bytes = n,
        fake_width = n % 640 + 1,
        fake_height = (n * 7) % 480 + 1,
        format = formatOf(r.media))
    }

  private def formatOf(bytes: Array[Byte]): String = {
    // Deterministic stand-in for magic-byte sniffing.
    val b = if (bytes.isEmpty) 0 else bytes.length % 16
    if (b < 6) "jpeg" else if (b < 11) "png" else "webp"
  }

  /** Typed Dataset pipeline: text → fake media bytes → per-partition
    * batch decode. This is the `queries` entry; the formulas are
    * mirrored in SQL so the stub is oracle-checked. */
  def multimodalMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    media(s, dir).mapPartitions(decodeStub).toDF()
  }

  private def media(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      .as[MediaRow]
  }

  val FrameWidth = 256
  val FrameStride = 1024

  case class MediaFrame(doc_id: Long, frame_no: Int, frame_offset: Int,
      frame_bytes: Int, frame_md5: String)

  /** Frame sampling over the media bytes: every [[FrameStride]]-th
    * offset yields one [[FrameWidth]]-byte frame (≥1 frame per doc),
    * fingerprinted with md5 — a real video pipeline swaps the byte
    * slice for a container-aware keyframe extractor inside the same
    * per-partition seam. Frames are cut and hashed batch-locally;
    * only the ~50-byte (id, offset, digest) rows leave the seam, so
    * nothing media-sized is ever shuffled — the contract that keeps
    * frame sampling viable against 100 TB of video.
    *
    * The digest is md5 of the LOWERCASE HEX of the frame bytes (not
    * of the raw bytes): DuckDB 1.0 can neither slice a BLOB nor
    * md5 one, so hashing the hex encoding is the only formulation
    * both engines compute identically for arbitrary (non-ASCII)
    * content — the fingerprint stays deterministic and collision-
    * resistant, which is all a frame digest needs. */
  def frameSampleStub(rows: Iterator[MediaRow]): Iterator[MediaFrame] =
    frameSampleWith(rows, FrameStride, FrameWidth)

  /** The sampler core, parametrized so the scene-cut face can run a
    * finer grid than the keyframe index without touching it. */
  private[graft] def frameSampleWith(rows: Iterator[MediaRow],
      stride: Int, width: Int): Iterator[MediaFrame] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hexDigits = "0123456789abcdef".toCharArray
    rows.flatMap { r =>
      val len = r.media.length
      val n = math.max(1, (len + stride - 1) / stride)
      (0 until n).iterator.map { f =>
        val off = f * stride
        val size = math.max(0, math.min(off + width, len) - off)
        val hex = new Array[Byte](size * 2)
        var i = 0
        while (i < size) {
          val b = r.media(off + i) & 0xff
          hex(i * 2) = hexDigits(b >> 4).toByte
          hex(i * 2 + 1) = hexDigits(b & 0xf).toByte
          i += 1
        }
        md.reset()
        md.update(hex)
        MediaFrame(r.doc_id, f, off, size,
          md.digest().map(b => f"$b%02x").mkString)
      }
    }
  }

  /** #47b frame-sample `queries` entry. */
  def multimodalFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    media(s, dir).mapPartitions(frameSampleStub).toDF()
  }

  /** A frame shared by more docs than this is dropped before the
    * pair join: a degenerate frame (black frame, silence, padding)
    * common to everything would create one quadratic bucket —
    * production media dedup always df-caps its frame index (the same
    * hot-shingle guard text MinHash uses). Test data tops out at
    * df=4, so the cap is exercised structurally, not destructively. */
  val HotFrameMax = 50

  /** #47c Frame-hash media dedup: doc pairs sharing ≥1 sampled-frame
    * fingerprint — the containment check a video pipeline runs to
    * find re-encodes/clips of the same footage without decoding
    * anything twice. Composes [[multimodalFrames]]'s digest relation:
    * per-doc DISTINCT frame hashes (a frame repeated inside one doc
    * counts once), df-capped ([[HotFrameMax]]), then one equality
    * self-join on the 32-byte digest — candidate volume is bounded by
    * Σ df² over surviving frames, never n². Only digest rows shuffle;
    * media bytes never leave the sampling seam. */
  def frameDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Persisted (shared cache with the dedup family): the relation is
    // consumed three times (df count, both join sides) and without
    // the cache each consumer re-runs the frame-sampling decode over
    // ALL media — the one pass a 100 TB video pipeline cannot repeat.
    val frames = Dedup.memo(s, "frames", dir)(multimodalFrames(s, dir)
          .select(col("doc_id"), col("frame_md5")).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val rare = frames.join(
      frames.groupBy(col("frame_md5")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= HotFrameMax)
        .select(col("frame_md5")),
      "frame_md5")
    val a = rare.alias("a")
    val b = rare.alias("b")
    a.join(b, col("a.frame_md5") === col("b.frame_md5") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_frames"))
  }

  /** #47e Shot-boundary (scene-cut) detection — the segmentation step
    * a video pipeline runs between frame sampling (#47b) and per-shot
    * processing: a CUT is any sampled frame whose fingerprint differs
    * from its predecessor's (a real pipeline swaps the exact-hash
    * inequality for a perceptual-distance threshold inside the same
    * dataflow). One doc-keyed window over the ~50-byte digest rows —
    * media bytes stay in the sampling seam — then a per-doc rollup:
    * frame count, cut count, and the cut offsets as a comma-joined
    * string (scalar-output rule). Runs on its OWN [[SceneStride]]
    * grid, finer than the keyframe index's. Corpus note, spec-pinned:
    * on this synthetic text-backed media every adjacent frame pair
    * differs, so multi-frame docs report n_cuts = n_frames − 1 and
    * the no-cut branch is exercised by the single-frame
    * (< stride-sized) docs — the operator's discriminating power
    * comes from the digest, which frame-dedup already verifies
    * across docs. */
  /** Scene-grid stride/width: FINER than the keyframe index's 1024 —
    * the synthetic corpus's docs are 44–577 bytes, so the 1024 grid
    * would make every doc single-frame and the operator vacuous; 64
    * gives 1–10 frames per doc, exercising both the cut and the
    * single-frame branches at every SF. Mirrored in the oracle. */
  val SceneStride = 64
  val SceneWidth = 64

  def multimodalScenes(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_no"))
    media(s, dir)
      .mapPartitions(rows => frameSampleWith(rows, SceneStride, SceneWidth))
      .toDF()
      .select(col("doc_id"), col("frame_no"), col("frame_offset"), col("frame_md5"))
      .withColumn("prev", lag(col("frame_md5"), 1).over(w))
      .withColumn("is_cut", col("prev").isNotNull && col("prev") =!= col("frame_md5"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_frames"),
        sum(when(col("is_cut"), 1L).otherwise(0L)).as("n_cuts"),
        array_join(expr(
          "transform(sort_array(collect_list(CASE WHEN is_cut THEN frame_offset END)), x -> CAST(x AS STRING))"),
          ",").as("cut_offsets"))
  }

  /** Audio-window size (samples) and the silence threshold the RMS
    * compares against. Both mirrored verbatim in the oracle. */
  val AudioWindow = 64
  val SilenceRms = 100.0

  case class AudioMeta(doc_id: Long, n_samples: Int, n_windows: Int,
      n_silent: Int, mean_rms: Option[Double])

  /** STUB audio decode: a real implementation would decode a
    * compressed audio container to PCM here; this fake treats the
    * media bytes THEMSELVES as unsigned 8-bit samples, so the whole
    * windowed-energy pipeline downstream is real and oracle-checked.
    * Per full [[AudioWindow]]-sample window: RMS = sqrt(Σx²/W). The
    * arithmetic chain is bit-exact cross-engine BY CONSTRUCTION —
    * integer-valued squares sum exactly in doubles, /W is dyadic,
    * and IEEE sqrt is correctly rounded — so even the silence
    * BOUNDARY compare (rms < threshold) is deterministic, and the
    * per-doc mean accumulates in window order (array-local both
    * engines), never via a shuffled aggregate. */
  def audioStub(rows: Iterator[MediaRow]): Iterator[AudioMeta] =
    rows.map { r =>
      val n = r.media.length
      val nWin = n / AudioWindow
      val rmss = (0 until nWin).map { w =>
        var sumSq = 0.0
        var i = 0
        while (i < AudioWindow) {
          val x = (r.media(w * AudioWindow + i) & 0xff).toDouble
          sumSq += x * x
          i += 1
        }
        math.sqrt(sumSq / AudioWindow)
      }
      AudioMeta(r.doc_id, n, nWin,
        rmss.count(_ < SilenceRms),
        if (nWin == 0) None
        else Some(BigDecimal(rmss.sum / nWin)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }

  /** #47d Audio windowed-energy analysis — the audio face of the
    * multimodal seam (#47 meta = image, #47b/c frames = video, this
    * one audio): per-doc windowed RMS energy + silence-window
    * detection, the trim-silence/segment primitive an audio corpus
    * pipeline runs before transcription. Same seam contract as the
    * other faces: the decode is a mapPartitions stub (container
    * mandates no codec), the plumbing — typed batch iteration,
    * per-window math, only ~30-byte meta rows leaving the seam — is
    * real and fully hash-checked (the oracle recomputes the RMS
    * chain from the same bytes via ascii()). Zero-window short docs
    * exercise the NULL mean branch at every SF. */
  def multimodalAudio(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    media(s, dir).mapPartitions(audioStub).toDF()
  }
}
