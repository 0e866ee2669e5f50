package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Distributed Sudoku solver (reference `ex:dancing/Sudoku.java` /
  * `DistributedPentomino.java` shape: split the exact-cover search space
  * by a fixed prefix of choices, one map task per prefix, solutions
  * concatenated). The solver here is an original bitmask backtracker
  * (not a dancing-links port); the distribution strategy is the same —
  * enumerate all candidate assignments for the first `prefixCells` empty
  * cells, fan the branches out with `spark.range`-style parallelism, and
  * let each task finish its subtree independently.
  *
  * Scale: branch count grows geometrically with prefixCells, so the
  * search parallelizes to any cluster width with zero shared state; each
  * task's subtree is bounded and independent (embarrassingly parallel,
  * like every §2.6 compute kernel).
  */
object Sudoku {

  /** Solve the puzzle from `board` (0 = empty, row-major 81 cells),
    * invoking `emit` for every solution found. Bitmask backtracking over
    * the most-constrained-first cell order would be faster; plain
    * first-empty order keeps branch enumeration and sub-solving
    * consistent.
    */
  private def solve(board: Array[Int], emit: Array[Int] => Unit,
                    limit: Int = Int.MaxValue): Int = {
    val rows = new Array[Int](9)
    val cols = new Array[Int](9)
    val boxes = new Array[Int](9)
    var conflict = false
    for (i <- 0 until 81; if board(i) != 0) {
      val r = i / 9; val c = i % 9; val b = r / 3 * 3 + c / 3
      val bit = 1 << board(i)
      if ((rows(r) & bit) != 0 || (cols(c) & bit) != 0 || (boxes(b) & bit) != 0)
        conflict = true
      rows(r) |= bit; cols(c) |= bit; boxes(b) |= bit
    }
    if (conflict) return 0
    var found = 0
    def rec(i: Int): Unit = {
      if (found >= limit) return
      if (i == 81) { found += 1; emit(board.clone()); return }
      if (board(i) != 0) { rec(i + 1); return }
      val r = i / 9; val c = i % 9; val b = r / 3 * 3 + c / 3
      var d = 1
      while (d <= 9 && found < limit) {
        val bit = 1 << d
        if ((rows(r) & bit) == 0 && (cols(c) & bit) == 0 && (boxes(b) & bit) == 0) {
          board(i) = d; rows(r) |= bit; cols(c) |= bit; boxes(b) |= bit
          rec(i + 1)
          board(i) = 0; rows(r) &= ~bit; cols(c) &= ~bit; boxes(b) &= ~bit
        }
        d += 1
      }
    }
    rec(0)
    found
  }

  /** All candidate digit tuples for the first `prefixCells` empty cells —
    * the distributed branch seeds (9^prefixCells upper bound, pruned
    * later by each task's own constraint check).
    */
  private def branches(board: Array[Int], prefixCells: Int): Seq[(Seq[Int], Seq[Int])] = {
    val empties = board.indices.filter(board(_) == 0).take(prefixCells)
    empties.foldLeft(Seq((Seq.empty[Int], Seq.empty[Int]))) { case (acc, cell) =>
      for ((cells, digits) <- acc; d <- 1 to 9)
        yield (cells :+ cell, digits :+ d)
    }
  }

  /** Distributed solve: returns (n_solutions, solutions as 81-char
    * strings). Conflicting branches die instantly in their own task.
    */
  def solveDistributed(spark: SparkSession, puzzle: String,
                       prefixCells: Int = 2): DataFrame = {
    import spark.implicits._
    require(puzzle.length == 81, "puzzle must be 81 chars, 0/. = empty")
    val board = puzzle.map(ch => if (ch == '.' || ch == '0') 0 else ch - '0').toArray
    val seeds = branches(board, prefixCells)
    val solutions = spark.sparkContext
      .parallelize(seeds, math.min(seeds.size, 64).max(1))
      .flatMap { case (cells, digits) =>
        val b = board.clone()
        cells.zip(digits).foreach { case (i, d) => b(i) = d }
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        solve(b, sol => out += sol.mkString)
        out
      }.distinct().collect().sorted
    Seq((solutions.length.toLong, solutions.headOption.getOrElse("")))
      .toDF("n_solutions", "first_solution")
  }
}
