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

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 60-bit SimHash over a token array: each token's hash is the
    * first 15 hex digits of its md5 (= first 60 bits of the digest),
    * each bit votes +1/-1, the sign of each vote becomes the
    * signature bit. Single pass per document — and because the token
    * hash is md5-derived, the signature is bit-identical to the
    * portable SQL formulation (`CAST(concat('0x',
    * substr(md5(tok),1,15)) AS BIGINT)` bit votes), so the operator
    * stays oracle-checkable while running as one codegen'd call.
    *
    * Reference semantics: near-dup fingerprinting à la Charikar
    * (STOC'02 simhash), applied per document. */
  def simhash60(tokens: ArrayData): Long = {
    val votes = new Array[Int](60)
    val md = md5Local.get()
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      val s = tokens.get(t, org.apache.spark.sql.types.StringType)
        .asInstanceOf[UTF8String]
      md.reset()
      val d = md.digest(s.getBytes)
      // first 15 hex digits == first 8 bytes (big-endian) >>> 4
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      h = h >>> 4
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }
}
