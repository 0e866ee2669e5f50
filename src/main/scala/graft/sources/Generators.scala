package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Map-only synthetic data generators (reference `ex:RandomWriter.java`,
  * `ex:RandomTextWriter.java`): seeded, coordination-free sources —
  * `spark.range` splits the id space, every row derives from its id via
  * SplitMix64, so any row count generates identically at any parallelism
  * (same property as the reference's per-task seeded Randoms, but
  * fully deterministic).
  *
  * The word lexicon is an original small list (NOT the reference's
  * embedded word table): generator fidelity is about record shape and
  * size distributions, not the particular words.
  */
object Generators {

  @inline private def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** RandomWriter: n records of random bytes; key length in
    * [minKeyLen, maxKeyLen], value length in [minValLen, maxValLen]
    * (the reference defaults are 10..1000 / 0..20000).
    */
  def randomKV(spark: SparkSession, n: Long, seed: Long = 42L,
               minKeyLen: Int = 10, maxKeyLen: Int = 1000,
               minValLen: Int = 0, maxValLen: Int = 20000,
               partitions: Int = 0): DataFrame = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions
                else spark.sessionState.conf.numShufflePartitions
    spark.range(0L, n, 1L, parts).mapPartitions { it =>
      it.map { i =>
        val h = mix(seed ^ i)
        val kLen = minKeyLen + (((h >>> 8) % (maxKeyLen - minKeyLen + 1)).toInt)
        val vLen = minValLen + (((h >>> 24) % (maxValLen - minValLen + 1)).toInt)
        def bytes(len: Int, salt: Long): Array[Byte] = {
          val out = new Array[Byte](len)
          var j = 0
          var s = mix(h ^ salt)
          while (j < len) {
            if (j % 8 == 0) s = mix(s)
            out(j) = (s >>> ((j % 8) * 8)).toByte
            j += 1
          }
          out
        }
        (bytes(kLen, 0x1111L), bytes(vLen, 0x2222L))
      }
    }.toDF("key", "value")
  }

  private val lexicon: Array[String] = Array(
    "aurora", "basalt", "cobalt", "delta", "ember", "fjord", "garnet",
    "harbor", "isotope", "juniper", "krypton", "lattice", "meridian",
    "nimbus", "obsidian", "prairie", "quartz", "rhizome", "sierra",
    "timber", "umbra", "vertex", "willow", "xenon", "yonder", "zephyr",
    "anchor", "breccia", "cirrus", "dolomite", "eddy", "flume", "glacier",
    "hollow", "inlet", "jetty", "kelp", "lagoon", "mesa", "narrows")

  /** RandomTextWriter: n rows of `wordsMin..wordsMax` space-joined words
    * drawn from a fixed lexicon.
    */
  def randomText(spark: SparkSession, n: Long, seed: Long = 42L,
                 wordsMin: Int = 5, wordsMax: Int = 20,
                 partitions: Int = 0): DataFrame = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions
                else spark.sessionState.conf.numShufflePartitions
    val lex = lexicon
    spark.range(0L, n, 1L, parts).mapPartitions { it =>
      it.map { i =>
        val h = mix(seed ^ i)
        val nWords = wordsMin + ((h >>> 4) % (wordsMax - wordsMin + 1)).toInt
        val sb = new StringBuilder
        var j = 0
        var s = h
        while (j < nWords) {
          s = mix(s)
          if (j > 0) sb.append(' ')
          sb.append(lex(((s >>> 16) % lex.length).toInt))
          j += 1
        }
        (i, sb.toString)
      }
    }.toDF("id", "text")
  }

  /** Zipf-vocabulary text: n rows of `wordsMin..wordsMax` words, each
    * word drawn Zipf(1)-distributed over a `vocab`-term synthetic
    * vocabulary (`w<rank>`). Real text is Zipfian — the fixed 40-word
    * [[randomText]] lexicon makes every term a stop word at corpus
    * scale (df ≈ N), which turns inverted-index benchmarks degenerate;
    * this generator gives the realistic df spectrum (few hot terms,
    * a long moderate-df tail).
    *
    * Zipf(1) sampling is closed-form: with u uniform in (0, 1],
    * `rank = ⌊vocab^u⌋` has P(rank ≤ r) = ln r / ln vocab, i.e. density
    * ∝ 1/rank — no rejection loop, pure per-row arithmetic, and
    * deterministic from (seed, row, position).
    */
  def zipfText(spark: SparkSession, n: Long, vocab: Int = 1 << 17,
               seed: Long = 42L, wordsMin: Int = 30, wordsMax: Int = 80,
               partitions: Int = 0): DataFrame = {
    require(vocab > 1, s"vocab must be > 1, got $vocab")
    import spark.implicits._
    val parts = if (partitions > 0) partitions
                else spark.sessionState.conf.numShufflePartitions
    val v = vocab
    spark.range(0L, n, 1L, parts).mapPartitions { it =>
      it.map { i =>
        val h = mix(seed ^ i)
        val nWords = wordsMin + ((h >>> 4) % (wordsMax - wordsMin + 1)).toInt
        val sb = new StringBuilder
        var j = 0
        var s = h
        val lnV = math.log(v.toDouble)
        while (j < nWords) {
          s = mix(s)
          // u in (0, 1]: 53-bit mantissa, never exactly 0
          val u = ((s >>> 11) + 1).toDouble / (1L << 53).toDouble
          val rank = math.max(1L, math.min(v.toLong, math.exp(u * lnV).toLong))
          if (j > 0) sb.append(' ')
          sb.append('w').append(rank)
          j += 1
        }
        (i, sb.toString)
      }
    }.toDF("id", "text")
  }
}
