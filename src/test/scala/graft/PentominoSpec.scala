package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Pentomino

/** Exact-cover tiling kernel — reference `ex:dancing/Pentomino.java`,
  * `DistributedPentomino.java`. Counts are the published ones (up to
  * board symmetry): 3×20 → 2, 4×15 → 368.
  */
class PentominoSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  test("3x20 board has exactly 2 solutions; every piece used once") {
    val r = Pentomino.solveDistributed(spark, 3, 20)
      .as[(Int, Int, Long, String)].head()
    assert(r._3 == 2L)
    assert(r._4.length == 60)
    assert(r._4.groupBy(identity).values.forall(_.length == 5))
    assert(r._4.distinct.length == 12)
  }

  test("4x15 board has 368 solutions") {
    val r = Pentomino.solveDistributed(spark, 4, 15)
      .as[(Int, Int, Long, String)].head()
    assert(r._3 == 368L)
  }
}
