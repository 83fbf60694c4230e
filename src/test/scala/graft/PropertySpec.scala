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

  test("VectorOps.dotD equals the left-to-right fold reference") {
    val doubles = Gen.listOfN(8, Gen.chooseNum(-100.0, 100.0))
    check(Prop.forAll(doubles, doubles) { (a, b) =>
      val aa = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(a.toArray)
      val bb = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(b.toArray)
      // Exact equality: the kernel must reproduce the sequential fold
      // (the oracle's list_dot_product accumulation) bit-for-bit.
      graft.plans.VectorOps.dotD(aa, bb) ==
        a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    })
  }

  test("VectorOps.srpBandSigs equals the per-plane fold reference") {
    // The reference is the retired per-plane formulation: for plane
    // p, sign of the left-to-right double fold of
    // float-widened emb[d] * planeCoef(p, d) — the order the DuckDB
    // oracle's list_sum(list_transform(...)) mirror also uses.
    val floats = Gen.listOfN(16, Gen.chooseNum(-100f, 100f))
    check(Prop.forAll(floats) { a =>
      val aa = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(a.toArray)
      val sigs = graft.plans.VectorOps.srpBandSigs(aa, 8, 6)
      (0 until 8).forall { g =>
        val expect = (0 until 6).map { j =>
          val p = g * 6 + j
          val dot = a.indices.foldLeft(0.0) { (acc, d) =>
            acc + a(d).toDouble * graft.plans.VectorOps.planeCoef(p, d)
          }
          if (dot >= 0.0) '1' else '0'
        }.mkString
        sigs.getUTF8String(g).toString == expect
      }
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

  private val md = java.security.MessageDigest.getInstance("MD5")
  private def md5hex(s: String): String = {
    md.reset()
    md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
  }

  /** Character-based k-substrings, the shingles/trigram reference
    * semantics (codepoint-indexed like Spark substring). */
  private def charShingles(text: String, k: Int): Seq[String] = {
    val cps = text.codePoints().toArray
    val n = math.max(1, cps.length - (k - 1))
    (0 until n).map(i => new String(cps, i, math.min(k, cps.length - i).max(0)))
  }

  private val textGen: Gen[String] = Gen.frequency(
    8 -> Gen.listOf(Gen.frequency(
      10 -> Gen.alphaNumChar, 3 -> Gen.const(' '), 1 -> Gen.oneOf('é', 'ß', '中', '€'))
    ).map(_.mkString),
    1 -> Gen.const(""))

  test("repetitionStats kernel equals the naive count-map formulation") {
    check(Prop.forAll(textGen) { t =>
      val row = graft.plans.VectorOps.repetitionStats(
        org.apache.spark.unsafe.types.UTF8String.fromString(t))
      val tris = charShingles(t, 3)
      val counts = tris.groupBy(identity).view.mapValues(_.size)
      row.getLong(0) == tris.size.toLong &&
        row.getLong(1) == counts.values.max.toLong
    })
  }

  test("fpMinMax kernel equals min/max over per-shingle md5 hex") {
    check(Prop.forAll(textGen) { t =>
      val row = graft.plans.VectorOps.fpMinMax(
        org.apache.spark.unsafe.types.UTF8String.fromString(t))
      val hashes = charShingles(t, 8).map(md5hex)
      row.getUTF8String(0).toString == hashes.min &&
        row.getUTF8String(1).toString == hashes.max
    })
  }

  test("lshBandSigs kernel equals the salted-chunk-minima + band-md5 formula") {
    check(Prop.forAll(textGen) { t =>
      val sigs = graft.plans.VectorOps.lshBandSigs(
        org.apache.spark.unsafe.types.UTF8String.fromString(t))
      val sh = charShingles(t, 8)
      val mh = (0 until 16).map { j =>
        val salt = j / 4
        val off = (j % 4) * 8
        sh.map(x => md5hex(s"$salt|$x").substring(off, off + 8)).min
      }
      (0 until 4).forall { b =>
        sigs.getUTF8String(b).toString ==
          md5hex((0 until 4).map(r => mh(b * 4 + r)).mkString("|"))
      }
    })
  }

  test("cosineD matches cosine on float-representable doubles") {
    val floats = Gen.listOfN(8, Gen.chooseNum(-100f, 100f).suchThat(_ != 0f))
    check(Prop.forAll(floats) { a =>
      val fa = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(a.toArray)
      val da = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        a.map(_.toDouble).toArray)
      math.abs(graft.plans.VectorOps.cosineD(da, da) - 1.0) < 1e-12 &&
        math.abs(graft.plans.VectorOps.cosine(fa, fa) -
          graft.plans.VectorOps.cosineD(da, da)) < 1e-12
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
