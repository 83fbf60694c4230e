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
    val media: Dataset[MediaRow] = Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      .as[MediaRow]
    media.mapPartitions(decodeStub).toDF()
  }
}
