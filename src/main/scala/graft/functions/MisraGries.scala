package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items sketch as a typed
  * `org.apache.spark.sql.expressions.Aggregator` — the candidate
  * pass of the classic two-pass heavy-hitters algorithm (Misra &
  * Gries 1982; mergeable form per Agarwal et al., "Mergeable
  * Summaries", PODS 2012).
  *
  * Reference analogue: the Hadoop `lib/aggregate` ValueHistogram
  * keeps EVERY distinct value's count per key — exact, but the
  * buffer grows with cardinality and dies on a 100 TB fact column.
  * This sketch holds ≤ `cap` counters however large the input, and
  * merges combiner-style (pointwise sum, then subtract the
  * (cap+1)-th largest count and drop non-positives), so partial
  * aggregation works exactly like a MapReduce combiner.
  *
  * Guarantee (the spec pins it on randomized data): after any
  * sequence of reduces and merges over N items, every item with
  * true count > N/(cap+1) is present in the final summary, and each
  * surviving counter underestimates its true count by at most
  * N/(cap+1). The summary is therefore a SUPERSET of the φ-heavy
  * hitters for any φ ≥ 1/(cap+1) — the exact confirm pass
  * (`Aggregators.heavyHitterWords`) trims it to the true set, so
  * the sketch's approximation never reaches the oracle-checked
  * result.
  *
  * `finish` sorts the surviving keys so the emitted candidate array
  * is deterministic under any partitioning / merge order (counter
  * VALUES are merge-order-dependent; the survivor KEY SET above the
  * guarantee threshold is not, and only keys feed pass 2).
  */
class MisraGries(cap: Int) extends Aggregator[String, Map[String, Long], Seq[String]] {
  require(cap > 0, s"Misra-Gries capacity must be positive, got $cap")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
    buf.get(item) match {
      case Some(c) => buf.updated(item, c + 1L)
      case None if buf.size < cap => buf.updated(item, 1L)
      case None =>
        // Full and item absent: decrement every counter (the classic
        // MG step — charges the miss against cap+1 distinct items),
        // dropping counters that reach zero.
        buf.flatMap { case (k, c) => if (c > 1L) Some(k -> (c - 1L)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (acc, (k, c)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + c)
    }
    if (summed.size <= cap) summed
    else {
      // Subtract the (cap+1)-th largest count from all, keep positives:
      // exactly cap survive at most, and the per-item error stays
      // bounded by N/(cap+1) (Mergeable Summaries, Thm. 1).
      val d = summed.values.toIndexedSeq.sorted(Ordering[Long].reverse)(cap)
      summed.flatMap { case (k, c) => if (c > d) Some(k -> (c - d)) else None }
    }
  }

  override def finish(buf: Map[String, Long]): Seq[String] =
    buf.keys.toVector.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
