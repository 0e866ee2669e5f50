package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Distributed pentomino tiling (reference `ex:dancing/Pentomino.java` +
  * `DistributedPentomino.java`: exact-cover search split by a prefix of
  * placements, one map task per prefix). This is an original
  * implementation — leftmost-empty-cell backtracking over precomputed
  * piece orientations, NOT a dancing-links port; the distribution shape
  * (independent subtrees per first-placement branch) matches the
  * reference's.
  *
  * Solutions are counted up to board symmetry (canonical form = min over
  * the rectangle's 4 transforms), which is how the published counts are
  * stated: 3×20 → 2, 4×15 → 368, 5×12 → 1010, 6×10 → 2339.
  */
object Pentomino {

  /** The 12 pentominoes as (row, col) cell sets (standard shapes). */
  private val basePieces: Seq[(Char, Seq[(Int, Int)])] = Seq(
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
    val mr = cells.map(_._1).min
    val mc = cells.map(_._2).min
    cells.map { case (r, c) => (r - mr, c - mc) }.sorted
  }

  /** Distinct orientations (rotations × reflections) per piece. */
  private val orientations: Seq[(Int, Seq[Seq[(Int, Int)]])] =
    basePieces.zipWithIndex.map { case ((_, cells), idx) =>
      val all = scala.collection.mutable.LinkedHashSet.empty[Seq[(Int, Int)]]
      var cur = cells
      for (_ <- 0 until 2) {
        for (_ <- 0 until 4) {
          all += normalize(cur)
          cur = cur.map { case (r, c) => (c, -r) } // rotate 90°
        }
        cur = cur.map { case (r, c) => (r, -c) } // reflect
      }
      (idx, all.toSeq)
    }

  /** Placements covering a given anchor cell, as row-major offset lists
    * relative to the orientation's FIRST cell (its row-major minimum) —
    * placing at the leftmost empty cell means that cell is the piece's
    * first cell.
    */
  private def placementsFor(rows: Int, cols: Int): Array[Array[(Int, Array[Int])]] = {
    // index: anchor cell → array of (pieceIdx, cellIdx offsets incl anchor)
    val out = Array.fill(rows * cols)(
      scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Int])])
    for ((pieceIdx, os) <- orientations; o <- os) {
      val first = o.head // (0, c0) with c0 = min col of row 0 cells
      for (ar <- 0 until rows; ac <- 0 until cols) {
        // place so that `first` lands on (ar, ac)
        val cells = o.map { case (r, c) => (ar + r - first._1, ac + c - first._2) }
        if (cells.forall { case (r, c) => r >= 0 && r < rows && c >= 0 && c < cols })
          out(ar * cols + ac) += ((pieceIdx, cells.map { case (r, c) => r * cols + c }.toArray))
      }
    }
    out.map(_.toArray)
  }

  /** Sequential exact-cover search from a partial state; emits full
    * board strings (one char per cell = piece letter).
    */
  private def search(rows: Int, cols: Int, board: Array[Int], usedMask: Int,
                     placements: Array[Array[(Int, Array[Int])]],
                     emit: String => Unit): Unit = {
    val n = rows * cols
    val seen = new Array[Int](n)
    var stamp = 0
    val stack = new Array[Int](n)

    /** Dead-region prune: every connected empty region must have size
      * divisible by 5 or no set of whole pentominoes can fill it —
      * the classic cut that removes most of the search tree.
      */
    def regionsOk(): Boolean = {
      stamp += 1
      var i = 0
      while (i < n) {
        if (board(i) < 0 && seen(i) != stamp) {
          var size = 0
          var top = 0
          stack(top) = i; top += 1; seen(i) = stamp
          while (top > 0) {
            top -= 1
            val c = stack(top)
            size += 1
            val r = c / cols; val cc = c % cols
            def push(x: Int): Unit =
              if (board(x) < 0 && seen(x) != stamp) { seen(x) = stamp; stack(top) = x; top += 1 }
            if (r > 0) push(c - cols)
            if (r < rows - 1) push(c + cols)
            if (cc > 0) push(c - 1)
            if (cc < cols - 1) push(c + 1)
          }
          if (size % 5 != 0) return false
        }
        i += 1
      }
      true
    }

    def rec(used: Int): Unit = {
      var cell = 0
      while (cell < n && board(cell) >= 0) cell += 1
      if (cell == n) {
        emit(board.map(p => basePieces(p)._1).mkString)
        return
      }
      for ((piece, cells) <- placements(cell)) {
        if ((used & (1 << piece)) == 0 && cells.forall(board(_) < 0)) {
          cells.foreach(board(_) = piece)
          if (regionsOk()) rec(used | (1 << piece))
          cells.foreach(board(_) = -1)
        }
      }
    }
    rec(usedMask)
  }

  /** Canonical form under the rectangle's symmetry group (identity,
    * 180° rotation, horizontal flip, vertical flip).
    */
  private def canonical(sol: String, rows: Int, cols: Int): String = {
    def at(r: Int, c: Int) = sol(r * cols + c)
    val variants = Seq(
      sol,
      (for (r <- rows - 1 to 0 by -1; c <- cols - 1 to 0 by -1) yield at(r, c)).mkString,
      (for (r <- 0 until rows; c <- cols - 1 to 0 by -1) yield at(r, c)).mkString,
      (for (r <- rows - 1 to 0 by -1; c <- 0 until cols) yield at(r, c)).mkString)
    variants.min
  }

  /** Distributed solve: branch on every placement covering cell 0 (the
    * reference's prefix split), finish each subtree in its own task,
    * dedupe canonically. Returns one row:
    * (rows, cols, n_solutions, first_solution).
    */
  def solveDistributed(spark: SparkSession, rows: Int, cols: Int): DataFrame = {
    import spark.implicits._
    require(rows * cols == 60, "pentomino board must have 60 cells")
    val placements = placementsFor(rows, cols)
    val seeds = placements(0).toSeq
    val solutions = spark.sparkContext
      .parallelize(seeds, math.max(1, math.min(seeds.size, 64)))
      .flatMap { case (piece, cells) =>
        val board = Array.fill(rows * cols)(-1)
        cells.foreach(board(_) = piece)
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        search(rows, cols, board, 1 << piece, placements, out += _)
        out
      }
      .map(canonical(_, rows, cols))
      .distinct()
      .collect().sorted
    Seq((rows, cols, solutions.length.toLong, solutions.headOption.getOrElse("")))
      .toDF("rows", "cols", "n_solutions", "first_solution")
  }
}
