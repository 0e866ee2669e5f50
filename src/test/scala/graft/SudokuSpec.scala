package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sudoku

/** Distributed backtracking kernel — reference `ex:dancing/Sudoku.java`
  * (prefix-split search space, independent subtrees per task).
  */
class SudokuSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private val puzzle =
    "103050709050709020709020406030507090507090204090204060305070902070902040902040608"
  private val solution =
    "123456789456789123789123456234567891567891234891234567345678912678912345912345678"

  test("unique-solution puzzle solved; prefix split does not change the answer") {
    for (prefix <- Seq(1, 3)) {
      val r = Sudoku.solveDistributed(spark, puzzle, prefixCells = prefix)
        .as[(Long, String)].head()
      assert(r == ((1L, solution)))
    }
  }

  test("contradictory puzzle yields zero solutions") {
    val bad = "11" + puzzle.drop(2) // two 1s in row 0
    val r = Sudoku.solveDistributed(spark, bad).as[(Long, String)].head()
    assert(r == ((0L, "")))
  }

  test("underdetermined puzzle counts multiple solutions") {
    val open = solution.take(40) + "0" * 41
    val r = Sudoku.solveDistributed(spark, open).as[(Long, String)].head()
    assert(r._1 > 1L)
  }
}
