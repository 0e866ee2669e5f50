package graft

import org.apache.spark.sql.functions._
import graft.operators.{ProductQuant, Similarity}

/** Dev probe for the IVFPQ path.
  *
  * `gate` (default): recall of ivfPqQuery vs brute force at the sim9
  * parameters over the sf0.01/sf0.1 embeddings tables — the go/no-go
  * for wiring the oracle gate.
  *
  * `scale <n> [<n>…]`: at /tmp/graft-scale/emb<n> (DevSimScale's
  * corpus): build wall, LIST BYTES vs the raw-vector index (the number
  * PQ exists for), query wall vs the raw ivfQuery at the same
  * probeFrac, recall vs brute force on ~100 queries.
  */
object DevPq {
  def main(args: Array[String]): Unit = {
    val mode = if (args.isEmpty) "gate" else args(0)
    val spark = SharedSpark.spark
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    def recallReport(tag: String, table: String,
                     emb: org.apache.spark.sql.DataFrame,
                     q: org.apache.spark.sql.DataFrame, nq: Long,
                     probeFrac: Double, refineK: Int): Unit = {
      val exact = Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5)
        .select("qid", "nid").cache()
      exact.count()
      val (approx, tQ) = timed {
        val a = ProductQuant.ivfPqQuery(spark, table, q, "vec_id",
          "embedding", 5, probeFrac = probeFrac, refineK = refineK)
          .select("qid", "nid").cache()
        a.count(); a
      }
      val hits = exact.join(approx, Seq("qid", "nid"))
        .groupBy("qid").agg(count(lit(1)).as("h"))
      val pass = hits.filter(col("h") >= 3).count()
      val minH = hits.agg(min("h")).head().getLong(0)
      val byHits = hits.groupBy("h").count().orderBy("h")
        .collect().map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(" ")
      println(f"[pq] $tag pass=$pass/$nq minHits=$minH query=${tQ}%.1fs hist[$byHits]")
      System.out.flush()
      exact.unpersist(); approx.unpersist()
    }

    if (mode == "gate") {
      for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
        val emb = Tables.embeddings(spark, sf)
        val n = emb.count()
        val q = emb.filter(col("vec_id") % 100 === 0)
        val nq = q.count()
        for (m <- Seq(8, 16); frac <- Seq(0.5); rk <- Seq(0, 50)) {
          val table = s"pq_gate_${n}_${m}_$rk"
          val (_, tB) = timed {
            ProductQuant.ivfPqBuild(emb, "vec_id", "embedding", table, m = m)
          }
          val rkEff = if (rk > 0) rk else math.max(4 * 5, 32)
          recallReport(f"$sf%-25s N=$n m=$m refineK=$rkEff build=${tB}%.1fs",
            table, emb, q, nq, frac, rk)
        }
      }
    } else if (mode == "scale") {
      args.drop(1).map(_.toLong).foreach { n =>
        val dir = s"/tmp/graft-scale/emb$n"
        require(new java.io.File(s"$dir/_SUCCESS").exists(),
          s"$dir missing — run DevSimScale $n first")
        val emb = spark.read.parquet(dir)
        val qStep = math.max(1L, n / 100)
        val q = emb.filter(col("vec_id") % qStep === 0 && col("vec_id") < n)
        val nq = q.count()
        def tblBytes(t: String): Long = {
          val loc = spark.sql(s"DESCRIBE TABLE EXTENDED $t")
            .filter(col("col_name") === "Location").head().getString(1)
          val d = new java.io.File(new java.net.URI(loc))
          Option(d.listFiles()).map(_.filter(_.isFile).map(_.length()).sum)
            .getOrElse(0L)
        }
        for (m <- Seq(8, 16)) {
          val table = s"pq_scale_${n}_$m"
          val (_, tBuild) = timed {
            ProductQuant.ivfPqBuild(emb, "vec_id", "embedding", table,
              m = m, buckets = 32)
          }
          val codeBytes = tblBytes(table)
          val rawBytes = tblBytes(s"${table}_vecs")
          println(f"[pqscale] n=$n m=$m build=${tBuild}%.1fs lists=${codeBytes / 1e6}%.1fMB " +
            f"raw=${rawBytes / 1e6}%.1fMB ratio=${rawBytes.toDouble / math.max(codeBytes, 1)}%.1fx")
          System.out.flush()
          for (frac <- Seq(0.125); rk <- Seq(50, 250)) {
            recallReport(f"scale n=$n m=$m frac=$frac%.3f refineK=$rk",
              table, emb, q, nq, frac, rk)
          }
        }
        // raw-vector ivfQuery at the same probeFrac — the serving
        // baseline the quantized scan is traded against
        val rawTable = s"pqraw_scale_$n"
        val (_, tRawBuild) = timed {
          Similarity.ivfBuild(emb, "vec_id", "embedding", rawTable,
            buckets = 32)
        }
        val (c, tRaw) = timed {
          Similarity.ivfQuery(spark, rawTable, q, "vec_id", "embedding",
            5, probeFrac = 0.125).count()
        }
        println(f"[pqscale] n=$n raw-ivfQuery build=${tRawBuild}%.1fs " +
          f"frac=0.125 rows=$c ${tRaw}%.1fs lists=${tblBytes(rawTable) / 1e6}%.1fMB")
        System.out.flush()
      }
    } else sys.error(s"unknown mode $mode")
    spark.stop()
  }
}
