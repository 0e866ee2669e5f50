package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bbp
import graft.sources.Generators

/** Synthetic generators + BBP kernel — reference `ex:RandomWriter.java`,
  * `ex:RandomTextWriter.java`, `ex:BaileyBorweinPlouffe.java`.
  */
class GeneratorsSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  test("bbp: first 16 hex digits of pi") {
    val got = (1L to 16L).map(Bbp.hexDigitAt).mkString
    assert(got == "243F6A8885A308D3")
  }

  test("bbp: digit at a deep position is stable and valid hex") {
    val d = Bbp.hexDigitAt(1000)
    assert(d.length == 1 && "0123456789ABCDEF".contains(d))
    assert(Bbp.hexDigitAt(1000) == d)
  }

  test("distsum: pi to 80 decimals, split-count invariant") {
    import graft.operators.DistSum
    val r16 = DistSum.pi(spark, 80, splits = 16).as[(Int, String)].head()
    val r3 = DistSum.pi(spark, 80, splits = 3).as[(Int, String)].head()
    assert(r16 == r3)
    assert(r16._2.startsWith(
      "3.1415926535897932384626433832795028841971693993751058209749445923078164062862089"))
  }

  test("randomKV: deterministic, length bounds honored, parallelism-independent") {
    val a = Generators.randomKV(spark, 200, seed = 9L, maxValLen = 100, partitions = 2)
      .as[(Array[Byte], Array[Byte])].collect()
    val b = Generators.randomKV(spark, 200, seed = 9L, maxValLen = 100, partitions = 7)
      .as[(Array[Byte], Array[Byte])].collect()
    assert(a.length == 200)
    assert(a.forall { case (k, v) => k.length >= 10 && k.length <= 1000 && v.length <= 100 })
    assert(a.map(_._1.toSeq).toSet == b.map(_._1.toSeq).toSet)
  }

  test("zipfText: Zipf-shaped vocabulary, ranks in range, deterministic") {
    val rows = Generators.zipfText(spark, 2000, vocab = 1024, seed = 5L,
      wordsMin = 20, wordsMax = 40).as[(Long, String)].collect()
    assert(rows.length == 2000)
    val words = rows.flatMap(_._2.split(" "))
    assert(words.forall(_.startsWith("w")))
    val ranks = words.map(_.drop(1).toInt)
    assert(ranks.forall(r => r >= 1 && r <= 1024))
    // Zipf(1): P(rank ≤ r) = ln r / ln V — the hottest term is ~V/ln V
    // times more frequent than a tail term, and low ranks dominate:
    // ranks ≤ 32 should carry ≈ ln 32 / ln 1024 = 50% of the mass
    val lowMass = ranks.count(_ <= 32).toDouble / ranks.length
    assert(lowMass > 0.40 && lowMass < 0.60, s"lowMass=$lowMass")
    // distinct vocabulary actually spreads (not the 40-word lexicon)
    assert(ranks.distinct.length > 500)
    val again = Generators.zipfText(spark, 2000, vocab = 1024, seed = 5L,
      wordsMin = 20, wordsMax = 40).as[(Long, String)].collect()
    assert(rows.toSeq.sortBy(_._1) == again.toSeq.sortBy(_._1))
  }

  test("randomText: word counts in range, words from lexicon, deterministic") {
    val rows = Generators.randomText(spark, 300, seed = 3L, wordsMin = 4, wordsMax = 9)
      .as[(Long, String)].collect()
    assert(rows.length == 300)
    val counts = rows.map(_._2.split(" ").length)
    assert(counts.forall(c => c >= 4 && c <= 9))
    val again = Generators.randomText(spark, 300, seed = 3L, wordsMin = 4, wordsMax = 9)
      .as[(Long, String)].collect()
    assert(rows.toSeq.sortBy(_._1) == again.toSeq.sortBy(_._1))
  }
}
