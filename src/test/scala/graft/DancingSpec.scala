package graft

import graft.operators.{Dancing, Examples}
import org.apache.spark.sql.functions._

/** examples/dancing + BBP — the search-space fan-out examples.
  * Correctness here is pinned by published constants: the first 144
  * hex digits of π (the Blowfish P-array words), the 2,339 distinct
  * 6×10 pentomino tilings from Knuth's Dancing Links paper, and a
  * sudoku whose unique solution the DuckDB oracle re-derives with an
  * independent algorithm. */
class DancingSpec extends SparkSpecBase {

  test("DLX solves Knuth's 7-column example uniquely") {
    // Columns A..G = 0..6; the classic matrix from the DLX paper.
    val rows = IndexedSeq(
      Array(2, 4, 5), Array(0, 3, 6), Array(1, 2, 5),
      Array(0, 3), Array(1, 6), Array(3, 4, 6))
    val sols = Dancing.solveAll(7, rows, Nil)
    assert(sols.map(_.toSeq) == Vector(Seq(0, 3, 4)))
  }

  test("DLX respects fixed rows and reports dead prefixes as empty") {
    val rows = IndexedSeq(
      Array(2, 4, 5), Array(0, 3, 6), Array(1, 2, 5),
      Array(0, 3), Array(1, 6), Array(3, 4, 6))
    assert(Dancing.solveAll(7, rows, Seq(3)).map(_.toSeq) == Vector(Seq(0, 3, 4)))
    // row 1 (A,D,G) is in no solution: forcing it must yield nothing
    assert(Dancing.solveAll(7, rows, Seq(1)).isEmpty)
    // clashing fixed rows (both cover column 0/3) are infeasible
    assert(Dancing.solveAll(7, rows, Seq(1, 3)).isEmpty)
  }

  test("bbp_digits reproduces the first 144 hex digits of pi") {
    // The 18 32-bit words every crypto textbook ships as the Blowfish
    // P-array — i.e. hex digits 1..144 of π after the point.
    val expected = Seq(
      "243F6A88", "85A308D3", "13198A2E", "03707344", "A4093822",
      "299F31D0", "082EFA98", "EC4E6C89", "452821E6", "38D01377",
      "BE5466CF", "34E90C6C", "C0AC29B7", "C97C50DD", "3F84D5B5",
      "B5470917", "9216D5D9", "8979FB1B")
    val got = Examples.bbpDigits(spark, sfDir)
      .orderBy("d").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.map(_._1).toSeq == (0 until 18).map(_ * 8L + 1))
    assert(got.map(_._2).toSeq == expected)
  }

  test("bbp_digits is partition-count invariant (exact integer sums)") {
    val a = Examples.bbpDigits(spark, sfDir).orderBy("d").collect().toSeq
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val b = Examples.bbpDigits(spark, sfDir).orderBy("d").collect().toSeq
      assert(a == b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("sudoku_solve finds the unique solution and satisfies all constraints") {
    val rows = graft.operators.Dancing.sudokuSolve(spark, sfDir).collect()
    assert(rows.length == 1)
    val sol = rows(0).getString(0)
    assert(sol.length == 81 && sol.forall(c => c >= '1' && c <= '9'))
    // givens preserved
    Dancing.SudokuPuzzle.zipWithIndex.foreach { case (ch, i) =>
      if (ch != '0') assert(sol(i) == ch, s"given at $i overwritten")
    }
    // each row/col/box is a permutation of 1..9
    def group(idx: Seq[Int]) = idx.map(sol(_)).sorted.mkString
    (0 until 9).foreach { g =>
      assert(group((0 until 9).map(c => g * 9 + c)) == "123456789")
      assert(group((0 until 9).map(r => r * 9 + g)) == "123456789")
      val br = (g / 3) * 3; val bc = (g % 3) * 3
      assert(group(for (r <- 0 until 3; c <- 0 until 3)
        yield (br + r) * 9 + (bc + c)) == "123456789")
    }
  }

  test("pentomino_tilings matches Knuth's published 6x10 counts") {
    val row = Dancing.pentominoTilings(spark, sfDir).collect()(0)
    val (nSol, nCanon) = (row.getLong(0), row.getLong(1))
    // 2,339 tilings distinct up to the rectangle's 4 symmetries
    // (Dancing Links, Knuth 2000); no 6x10 tiling is self-symmetric,
    // so the raw count is exactly 4x that.
    assert(nCanon == 2339L, s"canonical count $nCanon")
    assert(nSol == 4 * 2339L, s"raw count $nSol")
    val sample = row.getString(2)
    assert(sample.length == 60)
    // a tiling uses each of the 12 pieces exactly 5 cells
    assert(sample.groupBy(identity).view.mapValues(_.length).toMap ==
      "FILNPTUVWXYZ".map(_ -> 5).toMap)
  }

  test("pentomino X-placement tasks partition the solution set disjointly") {
    // every solution contains exactly one X placement, so per-task
    // solution sets are disjoint and their union is the full set:
    // no duplicate board strings may appear
    val (rows, meta) = Dancing.pentominoRows()
    val xTasks = meta.indices.filter(i => meta(i)._1 == 'X')
    val boards = xTasks.flatMap(t =>
      Dancing.solveAll(6 * 10 + 12, rows, Seq(t)).map(Dancing.boardString(meta, _)))
    assert(boards.length == boards.distinct.length)
  }
}
