package graft

import graft.functions.KmvSketch
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based checks for the pure kernels — they exercise the
  * same code paths the Catalyst expressions and typed aggregator
  * call. */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  private val hexGen: Gen[String] =
    Gen.listOfN(32, Gen.oneOf("0123456789abcdef".toSeq)).map(_.mkString)

  test("KMV: merge is commutative, bounded, and equals bulk reduce") {
    val k = new KmvSketch(16)
    check(Prop.forAll(Gen.listOf(hexGen), Gen.listOf(hexGen)) { (xs, ys) =>
      val a = xs.foldLeft(k.zero)(k.reduce)
      val b = ys.foldLeft(k.zero)(k.reduce)
      k.merge(a, b) == k.merge(b, a) &&
        k.merge(a, b).size <= 16 &&
        k.merge(a, b) == (xs ++ ys).foldLeft(k.zero)(k.reduce)
    })
  }

  test("KMV: bottom-k is the sorted distinct prefix") {
    val k = new KmvSketch(8)
    check(Prop.forAll(Gen.listOf(hexGen)) { xs =>
      xs.foldLeft(k.zero)(k.reduce) == xs.distinct.sorted.take(8)
    })
  }

  test("VectorOps.cosine is symmetric and bounded") {
    val floats = Gen.listOfN(8, Gen.chooseNum(-100f, 100f))
    check(Prop.forAll(floats, floats) { (a, b) =>
      val aa = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(a.toArray)
      val bb = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(b.toArray)
      val c1 = graft.plans.VectorOps.cosine(aa, bb)
      val c2 = graft.plans.VectorOps.cosine(bb, aa)
      c1 == c2 && c1 >= -1.0 - 1e-9 && c1 <= 1.0 + 1e-9
    })
  }

  test("simhash60: order-insensitive, only low 60 bits set") {
    def sig(xs: Seq[String]): Long =
      graft.plans.VectorOps.simhash60(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          xs.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray))
    val toks = Gen.listOfN(6, Gen.alphaLowerStr.suchThat(_.nonEmpty))
    check(Prop.forAll(toks) { ts =>
      sig(ts) == sig(ts.reverse) && (sig(ts) & ~((1L << 60) - 1)) == 0L
    })
  }
}
