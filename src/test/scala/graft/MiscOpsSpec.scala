package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{MonteCarlo, Multimodal, SampleFilters}
import graft.streaming.Windows
import java.sql.Timestamp

class MiscOpsSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  test("radicalInverse: Halton base-2 sequence prefix") {
    val got = (1L to 4L).map(MonteCarlo.radicalInverse(_, 2))
    assert(got == Seq(0.5, 0.25, 0.75, 0.125))
  }

  test("pi estimate lands near pi") {
    val pi = MonteCarlo.piEstimate(spark, 50000)
      .select("pi_est").as[Double].head()
    assert(math.abs(pi - math.Pi) < 0.01)
  }

  test("percentFilter keeps a deterministic ~1/f subset") {
    val df = spark.range(10000).toDF("k")
    val n = df.filter(SampleFilters.percentFilter(col("k"), 10)).count()
    assert(n > 700 && n < 1300)
    val n2 = df.filter(SampleFilters.percentFilter(col("k"), 10)).count()
    assert(n == n2)
  }

  test("md5Filter matches DuckDB-style first-hex-digit semantics") {
    val df = spark.range(1000).toDF("k")
    val kept = df.filter(SampleFilters.md5Filter(col("k"))).count()
    assert(kept > 20 && kept < 130) // ~1/16 of 1000
  }

  test("strictlyOrderedPairs: closed form matches brute force; hot key streams") {
    import graft.operators.GroupStream
    // brute-force check on a small multiset
    val small = Seq(3L, 1L, 3L, 2L, 1L, 3L)
    var brute = 0L
    for (a <- small; b <- small) if (a < b) brute += 1
    assert(GroupStream.strictlyOrderedPairs(small.iterator) == (6L, brute))
    // hot key: 1e5 values over 365 distinct dates through the SAME
    // cogroup shape j4 uses — the old O(g²) loop would run 5e9
    // comparisons here; the stream holds only a 365-entry histogram.
    val n = 100000
    val c = Seq((1L, "SEG")).toDS()
    val o = (0 until n).map(i => (1L, (i % 365).toLong)).toDS()
    val out = c.groupByKey(_._1).cogroup(o.groupByKey(_._1)) { case (k, cs, os) =>
      if (cs.isEmpty || os.isEmpty) Iterator.empty
      else {
        val seg = cs.next()._2
        val (cnt, pairs) = GroupStream.strictlyOrderedPairs(os.map(_._2))
        Iterator((k, seg, cnt, pairs))
      }
    }.collect()
    // expected: C(n,2) - 365 * C(m,2) with m = n/365 spread (n=100000:
    // 100000 = 365*273 + 355 → 355 dates hold 274, 10 hold 273)
    val m = n / 365; val r = n % 365
    val ties = r.toLong * (m + 1) * m / 2 + (365L - r) * m * (m - 1) / 2
    val expect = n.toLong * (n - 1) / 2 - ties
    assert(out.toSeq == Seq((1L, "SEG", n.toLong, expect)))
  }

  test("real PNG decode: dims and pixel survive an encode→decode round trip") {
    val bytes = Multimodal.pngBytes(13, 7, 0xa1b2c3)
    assert(Multimodal.isImagePayload(bytes))
    val d = Multimodal.decodeImage(42L, bytes).get
    assert(d.width == 13 && d.height == 7 && d.px00 == 0xa1b2c3L)
    assert(d.n_bytes == bytes.length.toLong)
    // distributed typed path
    val media = Seq(Multimodal.MediaRow(1L, Multimodal.pngBytes(3, 2, 0x0000ff),
      "image")).toDS()
    val out = Multimodal.decodeImages(media).collect().toSeq
    assert(out == Seq(Multimodal.DecodedImage(1L, out.head.n_bytes, 3, 2, 0xffL)))
  }

  test("JPEG decode: dims survive a lossy encode→decode round trip") {
    val img = new java.awt.image.BufferedImage(11, 6,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    val bytes = out.toByteArray
    assert(Multimodal.isImagePayload(bytes)) // FF D8 FF magic
    val d = Multimodal.decodeImage(9L, bytes).get
    assert(d.width == 11 && d.height == 6) // dims exact even under lossy JPEG
  }

  test("decodeFeatures routes image payloads to the real decoder, text to the stub") {
    val png = Multimodal.pngBytes(5, 4, 0x123456)
    val media = Seq(
      Multimodal.MediaRow(1L, png, "image"),
      Multimodal.MediaRow(2L, "not an image".getBytes("UTF-8"), "video")).toDS()
    val r = Multimodal.decodeFeatures(media).collect().sortBy(_.id)
    assert(r(0).width == 5 && r(0).height == 4 && r(0).feature_hash == 0x123456L)
    val n2 = "not an image".getBytes("UTF-8").length
    assert(r(1).width == (n2 % 640) + 1 && r(1).n_bytes == n2.toLong) // stub path
  }

  test("real WAV decode: header fields and first sample survive encode→decode") {
    val wav = Multimodal.wavBytes(sampleRate = 11000, channels = 2,
      frames = 37, firstSample = -1234)
    assert(Multimodal.isAudioPayload(wav))
    val d = Multimodal.decodeAudio(7L, wav).get
    assert(d.sample_rate == 11000 && d.channels == 2)
    assert(d.frames == 37L && d.first_sample == -1234)
    // undecodable payloads return None, not garbage
    assert(Multimodal.decodeAudio(8L, "RIFFxxxxWAVE".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeAudio(9L, Array.emptyByteArray).isEmpty)
  }

  test("decodeFeatures routes WAV audio to the real decoder") {
    val wav = Multimodal.wavBytes(sampleRate = 8000, channels = 1,
      frames = 5, firstSample = 99)
    val media = Seq(Multimodal.MediaRow(3L, wav, "audio")).toDS()
    val r = Multimodal.decodeFeatures(media).collect()
    // audio mapping: channels→width, sample_rate→height, frames→feature_hash
    assert(r(0).width == 1 && r(0).height == 8000 && r(0).feature_hash == 5L)
    assert(r(0).n_bytes == wav.length.toLong)
  }

  test("mapSortedGroups: sorted streaming groups, partial consumption drained") {
    import graft.operators.GroupStream
    val ds = Seq((2L, 30L), (1L, 2L), (2L, 10L), (1L, 1L), (3L, 5L), (2L, 20L))
      .toDS().withColumnRenamed("_1", "k").withColumnRenamed("_2", "v")
      .as[(Long, Long)]
    // full consumption: values arrive sorted within each key
    val sums = GroupStream.mapSortedGroups(ds, Seq("k"), Seq("v"))(_._1) {
      (k, it) => Iterator((k, it.map(_._2).mkString("-")))
    }.collect().toMap
    assert(sums == Map(1L -> "1-2", 2L -> "10-20-30", 3L -> "5"))
    // partial consumption: f takes only the first (smallest) value; the
    // remainder must be drained, not leak into the next group
    val firsts = GroupStream.mapSortedGroups(ds, Seq("k"), Seq("v"))(_._1) {
      (k, it) => Iterator((k, it.next()._2))
    }.collect().toMap
    assert(firsts == Map(1L -> 1L, 2L -> 10L, 3L -> 5L))
    // hot key: 1e5 rows in one group stream through a constant-space fold
    val hot = (0 until 100000).map(i => (7L, i.toLong)).toDS()
      .withColumnRenamed("_1", "k").withColumnRenamed("_2", "v").as[(Long, Long)]
    val folded = GroupStream.mapSortedGroups(hot, Seq("k"), Seq("v"))(_._1) {
      (k, it) => var n = 0L; var s = 0L; it.foreach { r => n += 1; s += r._2 }
        Iterator((k, n, s))
    }.collect().toSeq
    assert(folded == Seq((7L, 100000L, 100000L * 99999L / 2)))
  }

  test("packByTokenBudget: matches serial prefix sum, parallelism-independent") {
    import graft.operators.Shards
    val rows = (0 until 500).map(i => (i.toLong, (i * 37 % 90 + 10).toLong))
    val df = rows.toDF("id", "n")
    def run(parts: Int) = Shards.packByTokenBudget(df, "id", "n", 777L, parts)
      .select("id", "shard").as[(Long, Long)].collect().toMap
    // serial reference: exclusive running total
    var running = 0L
    val expect = rows.map { case (id, n) =>
      val s = running / 777L; running += n; id -> s
    }.toMap
    assert(run(3) == expect)
    assert(run(13) == expect) // partition-count independent
    // every shard non-empty and contiguous in id order
    val shards = expect.toSeq.sortBy(_._1).map(_._2)
    assert(shards.sliding(2).forall { case Seq(a, b) => b == a || b == a + 1; case _ => true })
  }

  test("weightedSampleFilter: 0 drops all, 1 keeps all, default applies") {
    import graft.operators.Shards
    val df = (0 until 400).map(i => (i.toLong, s"s${i % 4}")).toDF("id", "src")
    val kept = df.filter(Shards.weightedSampleFilter(col("id"), col("src"),
        Map("s0" -> 0.0, "s1" -> 1.0), defaultWeight = 0.5))
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(!kept.contains("s0"))
    assert(kept("s1") == 100L)
    assert(kept("s2") > 25 && kept("s2") < 75) // ~50 of 100
    // deterministic across evaluations
    val again = df.filter(Shards.weightedSampleFilter(col("id"), col("src"),
        Map("s0" -> 0.0, "s1" -> 1.0), defaultWeight = 0.5)).count()
    assert(again == kept.values.sum)
  }

  test("weightedSampleFilter: sub-percent weight resolves (1/65536 grid)") {
    import graft.operators.Shards
    // A 0.1% weight must produce a usable non-zero threshold, not
    // collapse to 0 (old 1/256 grid floor'd 0.001 -> 0x00 = drop-all).
    val df = (0 until 200000).map(i => (i.toLong, "s")).toDF("id", "src")
    val kept = df.filter(Shards.weightedSampleFilter(col("id"), col("src"),
        Map("s" -> 0.001))).count()
    // E[kept] = 200000 * floor(65.536)/65536 = ~198; allow wide md5 noise
    assert(kept > 100 && kept < 320, s"0.1% weight kept $kept of 200000")
  }

  test("multimodal decode: deterministic fake features, partition-batched") {
    val docs = Seq((1L, "hello"), (2L, "a much longer payload here"))
      .toDF("id", "payload")
    val media = Multimodal.asMedia(docs, "id", "payload", "image")
    val feats = Multimodal.decodeFeatures(media).collect().sortBy(_.id)
    assert(feats.map(_.n_bytes).toSeq == Seq(5L, 26L))
    assert(feats.forall(f => f.width == (f.n_bytes % 640) + 1))
    // determinism: same input → same feature hash
    val again = Multimodal.decodeFeatures(media).collect().sortBy(_.id)
    assert(feats.map(_.feature_hash).toSeq == again.map(_.feature_hash).toSeq)
  }

  test("resize stub: deterministic downsample, typed schema, partition-batched") {
    val media = Seq(Multimodal.MediaRow(1L, Array.tabulate[Byte](4096)(_.toByte), "image"),
                    Multimodal.MediaRow(2L, Array.empty[Byte], "image")).toDS()
    val r = Multimodal.resize(media, 64, 64).collect().sortBy(_.id)
    assert(r.map(_.id).toSeq == Seq(1L, 2L))
    assert(r(0).bytes.length > 0 && r(0).bytes.length <= 4096)
    assert(r(1).bytes.length == 0)
    val again = Multimodal.resize(media, 64, 64).collect().sortBy(_.id)
    assert(r(0).bytes.toSeq == again(0).bytes.toSeq)
  }

  test("textNLines controls partition granularity") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nline").toString
    spark.range(0, 100).select(col("id").cast("string").as("value"))
      .coalesce(1).write.mode("overwrite").text(s"$dir/t")
    val df = graft.sources.Io.textNLines(spark, s"$dir/t", 10)
    assert(df.rdd.getNumPartitions == 10)
    assert(df.count() == 100)
  }

  test("sampleFrames chunks binary payloads at 1KiB boundaries") {
    val bytes = Array.fill[Byte](2500)(7)
    val media = Seq(Multimodal.MediaRow(1L, bytes, "video")).toDS()
    val frames = Multimodal.sampleFrames(media, stride = 1)
      .select("frame_offset").as[Int].collect().toSeq.sorted
    assert(frames == Seq(0, 1024, 2048))
  }

  test("keyframes: animated-GIF frames decode to exact count, dims, and colors") {
    val rgbs = Seq(0xab0102, 0x00ff7f, 0x123456)
    val gif = Multimodal.gifBytes(4, 3, rgbs)
    // real multi-frame round trip, frame order preserved
    val frames = Multimodal.decodeFrames(7L, gif)
    assert(frames.map(_.frame_index) == Seq(0, 1, 2))
    assert(frames.forall(f => f.width == 4 && f.height == 3))
    assert(frames.map(_.px00) == rgbs.map(_.toLong),
      "GIF palette round trip not lossless")
    // distributed 1→N explode; single-frame formats yield one frame;
    // unknown payloads are dropped (the sampleFrames stub's domain)
    val media = Seq(
      Multimodal.MediaRow(1L, gif, "gif"),
      Multimodal.MediaRow(2L, Multimodal.pngBytes(2, 2, 0x0000ff), "image"),
      Multimodal.MediaRow(3L, Array.fill[Byte](64)(9), "video")).toDS()
    val got = Multimodal.keyframes(media).collect()
      .groupBy(_.id).view.mapValues(_.length).toMap
    assert(got == Map(1L -> 3, 2L -> 1))
  }

  test("keyframes: motion-JPEG streams split on frame boundaries and decode per frame") {
    val rgbs = Seq(0x808080, 0x204060, 0xc0a080)
    val mj = Multimodal.mjpegBytes(6, 4, rgbs)
    assert(Multimodal.mjpegStarts(mj).length == 3, "three SOI frame starts")
    val frames = Multimodal.mjpegFrames(11L, mj)
    assert(frames.map(_.frame_index) == Seq(0, 1, 2))
    assert(frames.forall(f => f.width == 6 && f.height == 4))
    // JPEG is lossy: solid-color frames land within the DCT rounding band
    frames.zip(rgbs).foreach { case (f, rgb) =>
      def ch(v: Long, s: Int) = ((v >> s) & 0xff).toInt
      Seq(16, 8, 0).foreach { s =>
        assert(math.abs(ch(f.px00, s) - ch(rgb.toLong, s)) <= 8,
          f"channel>>$s off: got ${f.px00}%06x want $rgb%06x")
      }
    }
    // keyframes routes MJPEG through the splitter (plain ImageIO reads
    // only the first concatenated frame), single JPEGs stay single
    val media = Seq(
      Multimodal.MediaRow(1L, mj, "video"),
      Multimodal.MediaRow(2L, Multimodal.mjpegBytes(2, 2, Seq(0xff0000)), "image"))
      .toDS()
    val got = Multimodal.keyframes(media).collect()
      .groupBy(_.id).view.mapValues(_.length).toMap
    assert(got == Map(1L -> 3, 2L -> 1))
    // a torn tail frame drops without taking the stream down
    val torn = mj.take(mj.length - 40)
    val tf = Multimodal.mjpegFrames(12L, torn)
    assert(tf.length == 2 && tf.map(_.frame_index) == Seq(0, 1))
    // a corrupt MIDDLE frame (valid SOI/EOI envelope, garbage payload —
    // the shape ImageIO rejects with a RuntimeException, not IOException)
    // drops cleanly AND the survivors re-index contiguously: no gap in
    // frame_index where the bad slice sat
    val bad = Array(0xFF, 0xD8, 0xFF, 0xE0).map(_.toByte) ++
      Array.fill[Byte](64)(0x13) ++ Array(0xFF, 0xD9).map(_.toByte)
    val starts = Multimodal.mjpegStarts(mj)
    val oneFrame = mj.slice(0, starts(1))
    val spliced = oneFrame ++ bad ++ oneFrame ++ oneFrame
    assert(Multimodal.mjpegStarts(spliced).length == 4)
    val sf = Multimodal.mjpegFrames(13L, spliced)
    assert(sf.length == 3, s"expected 3 surviving frames, got ${sf.length}")
    assert(sf.map(_.frame_index) == Seq(0, 1, 2),
      s"survivors must re-index contiguously, got ${sf.map(_.frame_index)}")
  }

  test("cms_probe matches driver-side estimateCount and stays in codegen") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val words = spark.range(0, 5000)
      .select(concat(lit("w"), (col("id") % 97).cast("string")).as("word"))
    val sketch = words.stat.countMinSketch(col("word"), 0.001, 0.99, 42)
    val got = words.distinct()
      .select(col("word"),
        graft.functions.GraftFunctions.cmsProbe(col("word"), sketch).as("est"))
      .as[(String, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (w, est) => assert(est == sketch.estimateCount(w)) }
    // the probing projection participates in whole-stage codegen (the
    // whole point vs the UDF it replaced)
    // `*(1)` marks the projection as WholeStageCodegen stage 1
    val plan = words.select(
        graft.functions.GraftFunctions.cmsProbe(col("word"), sketch))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("cms_probe"))
  }

  test("bloom_probe: no false negatives, matches driver-side mightContain") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val keys = spark.range(0, 2000).select((col("id") * 3).as("k"))
    val bloom = keys.stat.bloomFilter("k", 2000L, 0.01)
    // every inserted key must probe true through the expression
    assert(keys.filter(!graft.functions.GraftFunctions.bloomProbe(col("k"), bloom))
      .count() == 0)
    // probe decisions agree with the driver-side filter on a mixed set
    val got = spark.range(0, 3000).select(col("id").as("k"))
      .select(col("k"),
        graft.functions.GraftFunctions.bloomProbe(col("k"), bloom).as("hit"))
      .as[(Long, Boolean)].collect()
    got.foreach { case (k, hit) => assert(hit == bloom.mightContainLong(k)) }
  }

  test("nanos→micros conversion is exact integer division at epoch scale") {
    // Epoch nanos ~1.7e18 exceed double's 2^53 exact range (ulp ≈ 256 ns
    // there): `col/1000` routes through double and truncates to a µs that
    // can be off by one. The loader uses `ts div 1000`; prove it exact on
    // boundary-adjacent values.
    val base = 1700000000000000000L
    val nanos = (0L to 2000L).map(base + _) ++ Seq(base - 1, base + 999999L)
    val df = nanos.toDF("ns")
    val got = df.select(expr("ns div 1000").as("us"), col("ns"))
      .as[(Long, Long)].collect()
    assert(got.forall { case (us, ns) => us == ns / 1000 })
    // and the double path really is wrong somewhere in this range
    val viaDouble = df.select((col("ns") / 1000L).cast("long").as("us"), col("ns"))
      .as[(Long, Long)].collect()
    assert(viaDouble.exists { case (us, ns) => us != ns / 1000 })
  }

  test("tumbling windows bucket events hourly") {
    val events = Seq(
      (Timestamp.valueOf("2026-01-01 10:05:00"), "click", 1.0, 1L),
      (Timestamp.valueOf("2026-01-01 10:55:00"), "click", 2.0, 1L),
      (Timestamp.valueOf("2026-01-01 11:05:00"), "click", 4.0, 1L))
      .toDF("ts", "event_type", "value", "user_id")
    val r = Windows.tumbling(events, "ts", "1 hour")
      .select("ws", "n", "sum_val").as[(String, Long, Double)]
      .collect().toSeq.sortBy(_._1)
    assert(r == Seq(("2026-01-01 10:00:00", 2L, 3.0),
                    ("2026-01-01 11:00:00", 1L, 4.0)))
  }

  test("session windows split on gap") {
    val events = Seq(
      (Timestamp.valueOf("2026-01-01 10:00:00"), "e", 1.0, 1L),
      (Timestamp.valueOf("2026-01-01 10:10:00"), "e", 1.0, 1L),
      (Timestamp.valueOf("2026-01-01 11:30:00"), "e", 1.0, 1L))
      .toDF("ts", "event_type", "value", "user_id")
    val r = Windows.sessions(events, "ts", "30 minutes")
      .select("user_id", "n_events").as[(Long, Long)].collect().toSeq.sortBy(_._2)
    assert(r == Seq((1L, 1L), (1L, 2L)))
  }

  test("streaming dedup drops in-watermark duplicates, keeps first arrival") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String, Long)]
    val dedup = Windows.streamingDedup(
      ms.toDF().toDF("ts", "fp", "doc_id"), "ts", "fp", "10 minutes")
    val q = dedup.writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      ms.addData(
        (Timestamp.valueOf("2026-01-01 10:00:00"), "fpA", 1L),
        (Timestamp.valueOf("2026-01-01 10:01:00"), "fpA", 2L), // dup of fpA
        (Timestamp.valueOf("2026-01-01 10:02:00"), "fpB", 3L))
      q.processAllAvailable()
      ms.addData((Timestamp.valueOf("2026-01-01 10:03:00"), "fpA", 4L)) // still dup
      q.processAllAvailable()
      val ids = spark.table("dedup_test").select("doc_id")
        .as[Long].collect().toSet
      assert(ids == Set(1L, 3L))
    } finally q.stop()
  }

  test("stream-stream interval join: two memory streams, watermark-pruned state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val lms = MemoryStream[(Long, Timestamp, Long)]
    val rms = MemoryStream[(Long, Timestamp)]
    val left = lms.toDF().toDF("p_id", "p_ts", "p_user")
      .withWatermark("p_ts", "1 hour")
    val right = rms.toDF().toDF("r_user", "r_ts")
      .withWatermark("r_ts", "1 hour")
    val joined = Windows.intervalJoin(left, "p_user", "p_ts",
      right, "r_user", "r_ts", "10 MINUTES", "0 SECONDS")
    val q = joined.writeStream.format("memory").queryName("ivj_test")
      .outputMode("append").start()
    try {
      rms.addData((1L, Timestamp.valueOf("2026-01-01 09:55:00")), // in window
                  (1L, Timestamp.valueOf("2026-01-01 09:40:00")), // too early
                  (2L, Timestamp.valueOf("2026-01-01 09:58:00"))) // other key
      lms.addData((100L, Timestamp.valueOf("2026-01-01 10:00:00"), 1L))
      q.processAllAvailable()
      val got = spark.table("ivj_test").select("p_id", "r_ts")
        .as[(Long, Timestamp)].collect().toSet
      assert(got == Set((100L, Timestamp.valueOf("2026-01-01 09:55:00"))))
    } finally q.stop()
  }

  test("stateful sessionization: gap-close within batch and timeout flush") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp, Double)]
    val events = ms.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "30 minutes")
      .as[Windows.SessionEvent](org.apache.spark.sql.Encoders.product)
    val out = Windows.statefulSessions(events, 30L * 60 * 1000)
    val q = out.writeStream.format("memory").queryName("sess_test")
      .outputMode("append").start()
    try {
      // session 1: two events; then an event > gap later in the SAME user
      // closes it inline
      ms.addData((1L, Timestamp.valueOf("2026-01-01 10:00:00"), 1.0),
                 (1L, Timestamp.valueOf("2026-01-01 10:10:00"), 2.0))
      q.processAllAvailable()
      ms.addData((1L, Timestamp.valueOf("2026-01-01 12:00:00"), 5.0))
      q.processAllAvailable()
      // advance the watermark far past session 2's end → timeout flush
      ms.addData((2L, Timestamp.valueOf("2026-01-01 14:00:00"), 0.5))
      q.processAllAvailable()
      ms.addData((2L, Timestamp.valueOf("2026-01-01 16:00:00"), 0.5))
      q.processAllAvailable()
      val rows = spark.table("sess_test")
        .as[Windows.ClosedSession].collect().toSeq
        .map(c => (c.user_id, c.session_start, c.session_end, c.n_events, c.sum_val))
      assert(rows.contains((1L, "2026-01-01 10:00:00", "2026-01-01 10:40:00", 2L, 3.0)))
      assert(rows.contains((1L, "2026-01-01 12:00:00", "2026-01-01 12:30:00", 1L, 5.0)))
    } finally q.stop()
  }

  test("file-source streaming e2e: readStream dir → windowed agg → parquet sink + checkpoint") {
    val root = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val in = s"$root/in"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    new java.io.File(in).mkdirs()
    // batch 1 lands before the stream starts; batch 2 arrives mid-stream
    Seq("2026-01-01 10:01:00,a", "2026-01-01 10:04:00,a")
      .toDF("value").coalesce(1).write.mode("append").text(in)
    val schemaed = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL("value STRING"))
      .text(in)
      .select(split(col("value"), ",").getItem(0).cast("timestamp").as("ts"),
        split(col("value"), ",").getItem(1).as("event_type"))
    val agg = Windows.streamingAgg(schemaed, "ts", "10 minutes", "5 minutes")
      .select(date_format(col("window.start"), "HH:mm").as("ws"),
        col("event_type"), col("n"))
    val q = agg.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    // append-mode parquet sink only emits windows closed by the
    // watermark; push a later batch and run a second incremental pass
    Seq("2026-01-01 10:31:00,b").toDF("value")
      .coalesce(1).write.mode("append").text(in)
    val q2 = agg.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q2.awaitTermination(60000)
    val rows = spark.read.parquet(out).select("ws", "event_type", "n")
      .as[(String, String, Long)].collect().toSet
    assert(rows.contains(("10:00", "a", 2L))) // closed by the advanced watermark
  }

  test("streaming form: windowed agg over a memory stream with watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String)]
    val agg = Windows.streamingAgg(ms.toDF().toDF("ts", "event_type"),
      "ts", "10 minutes", "5 minutes")
    val q = agg.writeStream.format("memory").queryName("w_test")
      .outputMode("complete").start()
    try {
      ms.addData((Timestamp.valueOf("2026-01-01 10:01:00"), "a"),
                 (Timestamp.valueOf("2026-01-01 10:04:00"), "a"),
                 (Timestamp.valueOf("2026-01-01 10:11:00"), "b"))
      q.processAllAvailable()
      val rows = spark.table("w_test").select("event_type", "n")
        .as[(String, Long)].collect().toSeq.sorted
      assert(rows == Seq(("a", 2L), ("b", 1L)))
    } finally q.stop()
  }
}
