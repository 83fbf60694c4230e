package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) sketch as a typed
  * `org.apache.spark.sql.expressions.Aggregator` — the custom typed
  * aggregation tier (SURVEY §4): a bounded bottom-k of hash values
  * that yields a distinct-count estimate in one pass.
  *
  * Reference analogue: Hadoop's `UniqValueCount` keeps the full uniq
  * set per key; KMV is its bounded-memory successor (Bar-Yossef et
  * al., "Counting distinct elements in a data stream", RANDOM 2002).
  * Buffer is ≤ k strings regardless of input size, merge is a k-way
  * bounded merge — exactly the combiner-friendly shape MapReduce
  * aggregators required, expressed as a Spark typed Aggregator.
  *
  * Deterministic (md5 order), so the bottom-k itself is
  * oracle-checkable: the k-th smallest hash matches
  * `ORDER BY h LIMIT 1 OFFSET k-1` over distinct hashes in any
  * engine.
  */
class KmvSketch(k: Int) extends Aggregator[String, Seq[String], KmvSketch.Result] {

  override def zero: Seq[String] = Vector.empty

  override def reduce(buf: Seq[String], hash: String): Seq[String] =
    insert(buf, hash)

  override def merge(a: Seq[String], b: Seq[String]): Seq[String] =
    b.foldLeft(a)(insert)

  /** Buffer invariant: sorted distinct, ≤ k elements — so membership
    * and position come from one binary search (the first cut's
    * `contains` + re-`sorted` per insert was O(k)+O(k log k) per row:
    * harmless at k=64, a footgun if k grows). */
  private def insert(buf: Seq[String], h: String): Seq[String] =
    if (buf.size == k && buf.last <= h) buf // full; h is a dup of last or too large
    else {
      val v = buf.toIndexedSeq
      v.search(h) match {
        case scala.collection.Searching.Found(_) => buf
        case scala.collection.Searching.InsertionPoint(i) =>
          val grown = (v.take(i) :+ h) ++ v.drop(i)
          if (grown.size > k) grown.init else grown
      }
    }

  override def finish(buf: Seq[String]): KmvSketch.Result = {
    val est =
      if (buf.size < k) buf.size.toDouble
      else (k - 1).toDouble / hashToUnit(buf.last)
    KmvSketch.Result(buf.size, if (buf.isEmpty) null else buf.last, est)
  }

  /** Map a 32-hex md5 to (0,1] via its first 15 hex digits. */
  private def hashToUnit(h: String): Double =
    java.lang.Long.parseLong(h.take(15), 16).toDouble / 0x1000000000000000L.toDouble

  override def bufferEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
  override def outputEncoder: Encoder[KmvSketch.Result] =
    Encoders.product[KmvSketch.Result]
}

object KmvSketch {
  case class Result(n_kept: Int, kth_hash: String, distinct_estimate: Double)
}
