package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextOps}
import graft.sources.Generators

/** Scale probe: time the dedup/cleaning operators on a generated corpus
  * N× the sf0.1 documents table to observe the scaling exponent.
  * `sbt "Test/runMain graft.DevScale [nDocs...]"`.
  */
object DevScale {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toLong) else Seq(5000L, 50000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.ensureRegistered(spark)

    sizes.foreach { n =>
      // text shaped like the fixtures (~50 words/doc), PLUS planted
      // near-dups (2%: a copy of every 50th doc with one appended
      // token) so the pair-verification stages process real matches,
      // not empty sets — pair counts below should be ≥ n/50.
      val base = Generators.randomText(spark, n, seed = 11L,
        wordsMin = 30, wordsMax = 80, partitions = 32)
        .select(col("id").as("doc_id"), col("text"))
      val planted = base.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + n).as("doc_id"),
          concat(col("text"), lit(" xq")).as("text"))
      val dir = s"/tmp/graft-scale/docs$n"
      base.unionByName(planted).write.mode("overwrite").parquet(dir)
      val docs = spark.read.parquet(dir)

      // GRAFT_SCALE_PROBES=substr,substr limits which probes run, so a
      // fourth-decade run can measure one variant without paying for
      // the whole family (the unblocked m=6 count alone is ~4 min at
      // 5.1e6 and quadratic beyond)
      val only = sys.env.get("GRAFT_SCALE_PROBES")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      def time(name: String)(body: => Long): Unit =
        if (only.forall(_.exists(name.contains))) {
          val t0 = System.nanoTime()
          val r = body
          println(f"[scale] n=$n $name: $r rows in ${(System.nanoTime() - t0) / 1e9}%.1fs")
          System.out.flush()
        }
      time("dd4 capped jaccard")(
        Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.8, 50).count())
      time("minhash banding")(
        Dedup.minhashLshPairs(docs, "text", "doc_id").count())
      time("simhash banding")(
        Dedup.simhashPairs(docs, "text", "doc_id").count())
      // candidate-pair curve: the quantity that must stay sub-quadratic
      time("simhash candidates m=6 (default)")(
        Dedup.simhashCandidates(docs, "text", "doc_id").count())
      time("simhash candidates m=6 + length block w=8")(
        Dedup.simhashCandidates(docs, "text", "doc_id", 8).count())
      if (n <= 200000)
        time("simhash candidates m=4 (old 4x16 scheme)")(
          Dedup.simhashCandidates(docs, "text", "doc_id", 0, 4).count())
      // past-the-birthday-wall variants: m=8 widens band keys from ~32
      // to ~40 bits (C(8,5)=56 bands of 5 byte-chunks), the length
      // block subdivides further — candidates should return to
      // near-linear where fixed ~32-bit keys went quadratic (~5e6 docs)
      time("simhash candidates m=8")(
        Dedup.simhashCandidates(docs, "text", "doc_id", 0, 8).count())
      time("simhash candidates m=8 + length block w=8")(
        Dedup.simhashCandidates(docs, "text", "doc_id", 8, 8).count())
      time("simhash pairs m=8 w=8")(
        Dedup.simhashPairs(docs, "text", "doc_id", 3, 8, 8).count())
      // planted-pair recall under m=8 + blocking: the planted dup edits
      // ONE token, so |Δtokens| = 1 < w and the within-block pigeonhole
      // still guarantees every hamming≤3 pair meets — found must equal
      // the planted pairs whose signatures truly sit at hamming≤3
      if (only.forall(_.exists("planted recall".contains))) {
        val sigs = docs.select(col("doc_id").as("id"),
          Dedup.simhash(col("text")).as("sig"))
        val truth = sigs.as("a").join(sigs.as("b"),
            col("b.id") === col("a.id") + n && col("a.id") % 50 === 0)
          .filter(graft.functions.GraftFunctions.hamming(
            col("a.sig"), col("b.sig")) <= 3).count()
        val found = Dedup.simhashPairs(docs, "text", "doc_id", 3, 8, 8)
          .filter(col("idb") === col("ida") + n && col("ida") % 50 === 0)
          .count()
        println(s"[scale] n=$n simhash m=8 w=8 planted recall: $found/$truth")
        System.out.flush()
      }
      // SHARDED banding (GRAFT_SCALE_SHARDS=S): S sequential passes,
      // each filtering pmod(key, S) BEFORE the banding exchange — peak
      // shuffle/spill bounded to ~1/S, the path past the single-box
      // disk wall measured at 1e7. One pass per shard does double duty
      // via accumulators: total candidate count AND planted-pair
      // collection (a second action per shard would re-run the banding).
      val shardCount = sys.env.get("GRAFT_SCALE_SHARDS").map(_.toInt).getOrElse(0)
      if (shardCount > 1 &&
          only.forall(_.exists("sharded".contains))) {
        val sc = spark.sparkContext
        val t0 = System.nanoTime()
        var totalPairs = 0L
        val found = scala.collection.mutable.Set.empty[(Long, Long)]
        for (s <- 0 until shardCount) {
          val ts = System.nanoTime()
          val cnt = sc.longAccumulator(s"shard${s}_pairs")
          val planted = sc.collectionAccumulator[(Long, Long)](s"shard${s}_planted")
          Dedup.simhashPairs(docs, "text", "doc_id", 3, 8, 8, shardCount, s)
            .select("ida", "idb").foreach { r =>
              val a = r.getLong(0); val b = r.getLong(1)
              cnt.add(1)
              if (b == a + n && a % 50 == 0) planted.add((a, b))
            }
          totalPairs += cnt.value
          planted.value.forEach(p => found += ((p._1, p._2)))
          println(f"[scale] n=$n sharded m=8 w=8 shard $s/$shardCount: " +
            f"${cnt.value} pairs in ${(System.nanoTime() - ts) / 1e9}%.1fs")
          System.out.flush()
        }
        val sigs = docs.select(col("doc_id").as("id"),
          Dedup.simhash(col("text")).as("sig"))
        val truth = sigs.as("a").join(sigs.as("b"),
            col("b.id") === col("a.id") + n && col("a.id") % 50 === 0)
          .filter(graft.functions.GraftFunctions.hamming(
            col("a.sig"), col("b.sig")) <= 3).count()
        println(f"[scale] n=$n sharded m=8 w=8 x$shardCount TOTAL: " +
          f"$totalPairs pairs, planted recall ${found.size}/$truth, " +
          f"${(System.nanoTime() - t0) / 1e9}%.1fs")
        System.out.flush()
      }
      time("quality metrics")(
        TextOps.qualityMetrics(docs, "text", "doc_id").count())
      // cluster-level dedup over the minhash pair graph: rounds =
      // diameter (planted dups form 2-cliques, so convergence is fast
      // regardless of n — the quantity to watch is time per round)
      time("components over minhash pairs")(
        Dedup.connectedComponents(
          Dedup.minhashLshPairs(docs, "text", "doc_id"), "ida", "idb").count())
    }
    spark.stop()
  }
}
