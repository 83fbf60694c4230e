package graft.plans

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Static numeric kernels called from both interpreted (`nullSafeEval`)
  * and generated (`doGenCode`) paths of the custom expressions. Keeping
  * the loop in one JIT-friendly static method means the generated code
  * is a single call — it stays inside WholeStageCodegen and the JVM
  * inlines/vectorizes the loop.
  */
object VectorOps {

  /** Cosine similarity of two float vectors, accumulated in double.
    * Returns 0.0 when either norm is zero (stable for padded/zero
    * embeddings rather than NaN). */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Dot product in double precision (left-to-right accumulation —
    * the same order the oracle's list_dot_product uses, so results
    * are bit-identical). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  /** 64-bit SimHash over a token array: each token hashes to 64 bits
    * (two 32-bit MurmurHash3 halves), each bit votes +1/-1, the sign
    * of each vote becomes the signature bit. Deterministic across
    * JVMs (pure function of the token chars).
    *
    * Reference semantics: near-dup fingerprinting à la Charikar
    * (SOSP'02 simhash), applied per document. */
  def simhash64(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      val s = tokens.get(t, org.apache.spark.sql.types.StringType)
        .asInstanceOf[UTF8String].toString
      val h1 = scala.util.hashing.MurmurHash3.stringHash(s, 0x9747b28c)
      val h2 = scala.util.hashing.MurmurHash3.stringHash(s, 0x85ebca6b)
      val h = (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }
}
