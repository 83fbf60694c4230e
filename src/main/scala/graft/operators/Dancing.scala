package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's `examples/dancing/` package — Knuth's Algorithm X
  * over Dancing Links, and the two puzzles the reference ships on top
  * of it — re-expressed with Spark doing what MapReduce did there:
  * split the search space into independent prefix tasks and fan them
  * out.
  *
  * Reference: `hadoop-mapreduce-examples/src/main/java/org/apache/
  * hadoop/examples/dancing/{DancingLinks,DistributedPentomino,
  * Pentomino,OneSidedPentomino,Sudoku}.java`. The reference's
  * DistributedPentomino generates placement prefixes, writes one line
  * per prefix, and lets each map task enumerate the subtree under its
  * prefix; Sudoku.java solves boards with the same exact-cover core.
  *
  * Spark-native shape: the prefix list is a tiny Dataset, the solver
  * runs inside `flatMap` (genuine per-partition imperative search —
  * the same "last resort" seam as the pipe subprocess; there is no
  * declarative form of backtracking search), and everything AFTER the
  * search (canonicalization counts, solution validation) is a normal
  * declarative aggregate. At scale the task list grows with prefix
  * depth (Hadoop's `pent.depth` knob), so the fan-out is as wide as
  * the cluster — each task carries only its fixed row ids.
  *
  * Determinism: the solver picks the minimum-size column with lowest-
  * index tie-break and walks rows top-down, so every task enumerates
  * its subtree in one fixed order; solutions across tasks form a
  * disjoint partition of the full solution set (each solution contains
  * exactly one placement of the split piece / branch digit).
  */
object Dancing {

  /** Exact-cover instance: columns `0 until nCols`, each row a sorted
    * array of distinct column indices. Solves with `fixed` rows
    * pre-selected (the distributed prefix / the puzzle givens);
    * returns all solutions as sorted row-id arrays, or Nil when a
    * fixed row conflicts. Bounded by `limit`. */
  def solveAll(nCols: Int, rows: IndexedSeq[Array[Int]], fixed: Seq[Int],
               limit: Int = Int.MaxValue): Vector[Array[Int]] = {
    val nCells = rows.iterator.map(_.length).sum
    val n = 1 + nCols + nCells
    val L = new Array[Int](n); val R = new Array[Int](n)
    val U = new Array[Int](n); val D = new Array[Int](n)
    val C = new Array[Int](n)         // owning column header per node
    val RW = new Array[Int](n)        // row id per cell node
    val S = new Array[Int](nCols + 1) // live size per column
    var i = 0
    while (i <= nCols) { L(i) = i - 1; R(i) = i + 1; U(i) = i; D(i) = i; C(i) = i; i += 1 }
    L(0) = nCols; R(nCols) = 0
    var next = nCols + 1
    var r = 0
    while (r < rows.length) {
      val cols = rows(r); var first = -1
      var k = 0
      while (k < cols.length) {
        val c = cols(k) + 1
        val nd = next; next += 1
        C(nd) = c; RW(nd) = r
        U(nd) = U(c); D(nd) = c; D(U(c)) = nd; U(c) = nd
        S(c) += 1
        if (first < 0) { first = nd; L(nd) = nd; R(nd) = nd }
        else { L(nd) = L(first); R(nd) = first; R(L(first)) = nd; L(first) = nd }
        k += 1
      }
      r += 1
    }
    val covered = new Array[Boolean](nCols + 1)
    def cover(c: Int): Unit = {
      covered(c) = true
      R(L(c)) = R(c); L(R(c)) = L(c)
      var a = D(c)
      while (a != c) {
        var b = R(a)
        while (b != a) { D(U(b)) = D(b); U(D(b)) = U(b); S(C(b)) -= 1; b = R(b) }
        a = D(a)
      }
    }
    def uncover(c: Int): Unit = {
      covered(c) = false
      var a = U(c)
      while (a != c) {
        var b = L(a)
        while (b != a) { S(C(b)) += 1; D(U(b)) = b; U(D(b)) = b; b = L(b) }
        a = U(a)
      }
      R(L(c)) = c; L(R(c)) = c
    }
    // Pre-select the fixed rows; a clash (two fixed rows sharing a
    // column, or a fixed row over an already-covered column) means
    // this prefix task's subtree is empty — return no solutions, the
    // same contract as a reference map task whose prefix is dead.
    val fixedArr = fixed.toArray.sorted
    var fi = 0
    while (fi < fixedArr.length) {
      val cols = rows(fixedArr(fi))
      if (cols.exists(c => covered(c + 1))) return Vector.empty
      cols.foreach(c => cover(c + 1))
      fi += 1
    }
    val sols = Vector.newBuilder[Array[Int]]
    var found = 0
    val choice = new Array[Int](nCols + 1)
    def search(depth: Int): Unit = {
      if (found >= limit) return
      if (R(0) == 0) {
        sols += (fixedArr ++ choice.take(depth)).sorted
        found += 1
        return
      }
      var c = R(0); var best = c; var bs = S(c)
      while (c != 0) { if (S(c) < bs) { bs = S(c); best = c }; c = R(c) }
      if (bs == 0) return
      cover(best)
      var a = D(best)
      while (a != best && found < limit) {
        choice(depth) = RW(a)
        var b = R(a); while (b != a) { cover(C(b)); b = R(b) }
        search(depth + 1)
        var k2 = L(a); while (k2 != a) { uncover(C(k2)); k2 = L(k2) }
        a = D(a)
      }
      uncover(best)
    }
    search(0)
    sols.result()
  }

  // ---------------------------------------------------------------
  // Pentomino (reference: examples/dancing/DistributedPentomino.java)
  // ---------------------------------------------------------------

  val BoardH = 6
  val BoardW = 10

  /** The 12 pentominoes, canonical cells (row, col). */
  val Pentominoes: Seq[(Char, Seq[(Int, Int)])] = Seq(
    'F' -> Seq((0, 1), (0, 2), (1, 0), (1, 1), (2, 1)),
    'I' -> Seq((0, 0), (1, 0), (2, 0), (3, 0), (4, 0)),
    'L' -> Seq((0, 0), (1, 0), (2, 0), (3, 0), (3, 1)),
    'N' -> Seq((0, 1), (1, 1), (2, 0), (2, 1), (3, 0)),
    'P' -> Seq((0, 0), (0, 1), (1, 0), (1, 1), (2, 0)),
    'T' -> Seq((0, 0), (0, 1), (0, 2), (1, 1), (2, 1)),
    'U' -> Seq((0, 0), (0, 2), (1, 0), (1, 1), (1, 2)),
    'V' -> Seq((0, 0), (1, 0), (2, 0), (2, 1), (2, 2)),
    'W' -> Seq((0, 0), (1, 0), (1, 1), (2, 1), (2, 2)),
    'X' -> Seq((0, 1), (1, 0), (1, 1), (1, 2), (2, 1)),
    'Y' -> Seq((0, 1), (1, 0), (1, 1), (2, 1), (3, 1)),
    'Z' -> Seq((0, 0), (0, 1), (1, 1), (2, 1), (2, 2)))

  private def normalize(cells: Seq[(Int, Int)]): Seq[(Int, Int)] = {
    val mr = cells.map(_._1).min; val mc = cells.map(_._2).min
    cells.map { case (r, c) => (r - mr, c - mc) }.sorted
  }

  /** All distinct orientations (4 rotations × optional reflection). */
  def orientations(cells: Seq[(Int, Int)]): Seq[Seq[(Int, Int)]] = {
    val rots = Iterator.iterate(cells, 4)(cs => cs.map { case (r, c) => (c, -r) }).toSeq
    val all = rots ++ rots.map(_.map { case (r, c) => (r, -c) })
    all.map(normalize).distinct
  }

  /** Exact-cover rows for the 6×10 board: one row per (piece,
    * orientation, anchor) placement; columns = 60 cells + 12 pieces.
    * Rebuilt deterministically inside each task — the matrix is ~2k
    * tiny rows, cheaper to reconstruct than to ship. */
  def pentominoRows(): (IndexedSeq[Array[Int]], IndexedSeq[(Char, Array[Int])]) = {
    val rows = IndexedSeq.newBuilder[Array[Int]]
    val meta = IndexedSeq.newBuilder[(Char, Array[Int])]
    Pentominoes.zipWithIndex.foreach { case ((label, base), pi) =>
      orientations(base).foreach { shape =>
        val h = shape.map(_._1).max + 1; val w = shape.map(_._2).max + 1
        var r0 = 0
        while (r0 + h <= BoardH) {
          var c0 = 0
          while (c0 + w <= BoardW) {
            val cells = shape.map { case (r, c) => (r0 + r) * BoardW + (c0 + c) }.toArray
            rows += (cells :+ (BoardH * BoardW + pi)).sorted
            meta += ((label, cells))
            c0 += 1
          }
          r0 += 1
        }
      }
    }
    (rows.result(), meta.result())
  }

  /** Render a solution (row ids) as the 60-char board string. */
  def boardString(meta: IndexedSeq[(Char, Array[Int])], sol: Array[Int]): String = {
    val out = new Array[Char](BoardH * BoardW)
    sol.foreach { r => val (label, cells) = meta(r); cells.foreach(out(_) = label) }
    new String(out)
  }

  /** Canonical form under the rectangle's symmetry group (identity,
    * 180° rotation, horizontal flip, vertical flip): the minimum of
    * the four transformed strings. */
  def canonicalBoard(s: String): String = {
    def at(r: Int, c: Int) = s(r * BoardW + c)
    val variants = Seq(
      s,
      (for (r <- 0 until BoardH; c <- 0 until BoardW) yield at(BoardH - 1 - r, BoardW - 1 - c)).mkString,
      (for (r <- 0 until BoardH; c <- 0 until BoardW) yield at(BoardH - 1 - r, c)).mkString,
      (for (r <- 0 until BoardH; c <- 0 until BoardW) yield at(r, BoardW - 1 - c)).mkString)
    variants.min
  }

  /** #30c Distributed pentomino enumeration. Split = DEPTH-2 prefixes,
    * (X placement × non-overlapping I placement) pairs — the
    * reference's `pent.depth` knob: every solution contains exactly
    * one X row and one I row, so the ~1.6k prefix tasks partition the
    * solution set disjointly, and the finer grain evens out the wild
    * subtree-size skew a 32-way X-only split leaves (one interior X
    * placement's subtree dominates the makespan; measured ~4× on
    * 32 cores). The exact-cover matrix is rebuilt once per PARTITION
    * (`mapPartitions`), not per task — construction is pure but not
    * free, and tasks in a partition share it read-only. Emits the
    * total solution count and the count distinct up to board symmetry
    * — 2,339 for 6×10, the number published in Knuth's Dancing Links
    * paper, which the spec pins. Search itself is imperative inside
    * the partition iterator; the counting is declarative.
    *
    * DuckDB cannot run a backtracking exact-cover search, so the
    * oracle is the PUBLISHED ground truth stated as constants: 2,339
    * symmetry-distinct 6×10 tilings (Knuth, "Dancing Links", 2000)
    * × the 4 board symmetries = 9,356 raw solutions, plus the
    * deterministic lexicographic-min solution string — a stronger
    * referee than any recomputation, and one the driver's hash check
    * now adjudicates (a search bug that loses or duplicates any
    * subtree flips a count; one that corrupts a placement flips the
    * min string). Per-solution validity stays spec-pinned. */
  def pentominoTilings(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (_, meta) = pentominoRows()
    val xRows = meta.indices.filter(i => meta(i)._1 == 'X')
    val iRows = meta.indices.filter(i => meta(i)._1 == 'I')
    val tasks = for {
      x <- xRows; i <- iRows
      if !meta(x)._2.exists(meta(i)._2.contains(_))
    } yield (x, i)
    s.createDataset(tasks.toSeq)
      .repartition(s.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        val (rows2, meta2) = pentominoRows()
        it.flatMap { case (x, i) =>
          solveAll(BoardH * BoardW + 12, rows2, Seq(x, i)).map { sol =>
            val b = boardString(meta2, sol)
            (b, canonicalBoard(b))
          }
        }
      }
      .toDF("sol", "canon")
      .agg(
        count(lit(1)).as("n_solutions"),
        count_distinct(col("canon")).as("n_canonical"),
        min(col("sol")).as("first_solution"))
  }

  // ---------------------------------------------------------------
  // Sudoku (reference: examples/dancing/Sudoku.java)
  // ---------------------------------------------------------------

  /** Fixed demo puzzle (0 = blank) — a standard unique-solution grid;
    * the reference reads its puzzle from a text file the same way. */
  val SudokuPuzzle: String =
    "530070000600195000098000060800060003400803001700020006060000280000419005000080079"

  /** Exact-cover encoding: 324 columns (81 cell-filled, 81 row-digit,
    * 81 col-digit, 81 box-digit), 729 candidate rows (r, c, d). */
  def sudokuRows(): IndexedSeq[Array[Int]] =
    for {
      r <- 0 until 9; c <- 0 until 9; d <- 0 until 9
    } yield {
      val box = (r / 3) * 3 + c / 3
      Array(r * 9 + c, 81 + r * 9 + d, 162 + c * 9 + d, 243 + box * 9 + d)
    }

  /** #30d Distributed sudoku solve: the givens are fixed rows; the
    * search space is split on the candidate digits of the first blank
    * cell — one task per digit, each task's subtree independent (the
    * reference's DistributedPentomino prefix pattern applied to
    * Sudoku.java's solver). Emits the solved 81-char grid; the DuckDB
    * oracle re-solves the same puzzle with the classic recursive-CTE
    * solver, so this one IS oracle-checked. */
  def sudokuSolve(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val puzzle = SudokuPuzzle
    val givens = puzzle.zipWithIndex.collect {
      case (ch, i) if ch != '0' => (i / 9) * 81 + (i % 9) * 9 + (ch - '1')
    }.toSeq
    val blank = puzzle.indexOf('0')
    val tasks = (0 until 9).map(d => (blank / 9) * 81 + (blank % 9) * 9 + d)
    s.createDataset(tasks)
      .repartition(math.min(tasks.length, s.sparkContext.defaultParallelism))
      .flatMap { assumption =>
        solveAll(324, sudokuRows(), givens :+ assumption).map { sol =>
          val out = new Array[Char](81)
          sol.foreach { rid =>
            val r = rid / 81; val c = (rid % 81) / 9; val d = rid % 9
            out(r * 9 + c) = ('1' + d).toChar
          }
          new String(out)
        }
      }
      .toDF("solution")
  }
}
