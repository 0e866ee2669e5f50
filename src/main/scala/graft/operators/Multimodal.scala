package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns + typed metadata, with decode / feature-extract as
  * per-partition batch transforms.
  *
  * The actual media decode is STUBBED (no image/audio libraries in this
  * container): `fakeDecode` derives deterministic pseudo-metadata from the
  * bytes. Everything around it — the binary schema, the partition-batched
  * transform shape (the Scala analog of `mapInPandas`: one iterator of
  * rows per partition, so a real decoder amortizes model/codec init per
  * partition, not per row), the output schema — is real and tested.
  * Swapping in a real decoder = replacing the body of `fakeDecode` only.
  */
object Multimodal {

  final case class MediaRow(id: Long, bytes: Array[Byte], media_type: String)
  final case class MediaFeatures(id: Long, media_type: String, n_bytes: Long,
                                 width: Int, height: Int, feature_hash: Long)

  /** STUB decoder — deterministic fake: dims from byte length, feature
    * hash from content (stands in for an embedding). Replace with a real
    * codec (e.g. javax.imageio / ffmpeg bindings) in production.
    */
  def fakeDecode(r: MediaRow): MediaFeatures = {
    val n = if (r.bytes == null) 0 else r.bytes.length
    var h = 0xcbf29ce484222325L // FNV-1a over bytes: cheap content hash
    var i = 0
    while (i < n) { h ^= (r.bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    MediaFeatures(r.id, r.media_type, n.toLong,
      width = (n % 640) + 1, height = (n % 480) + 1, feature_hash = h)
  }

  /** Partition-batched decode: the Spark-side plumbing that matters —
    * runs once per partition with an iterator (decoder init amortized),
    * keeps the pipeline distributed, output is a typed Dataset.
    */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // real impl: open codec/model here, close after the iterator
      it.map(fakeDecode)
    }
  }

  /** Frame-sample stub: pick every `stride`-th 1 KiB chunk of a video
    * blob as a "frame" (real impl: keyframe extraction). Shows the 1→N
    * explode shape with bounded memory.
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      val n = if (r.bytes == null) 0 else r.bytes.length
      (0 until n by (1024 * stride)).map { off =>
        val len = math.min(1024, n - off)
        (r.id, off, java.util.Arrays.copyOfRange(r.bytes, off, off + len))
      }
    }.toDF("id", "frame_offset", "frame_bytes")
  }

  final case class ResizedMedia(id: Long, media_type: String,
                                target_w: Int, target_h: Int,
                                bytes: Array[Byte])

  /** Resize stub: deterministic byte-domain downsample (every k-th byte
    * so output length tracks target area — a real impl decodes, bilinear
    * resizes, re-encodes). The Spark shape is the point: partition-batched
    * (codec init once per partition), typed output schema, bounded
    * per-row memory.
    */
  def resize(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // real impl: open codec here, close after the iterator
      it.map { r =>
        val n = if (r.bytes == null) 0 else r.bytes.length
        val target = math.max(1, math.min(n, targetW * targetH / 64))
        val stride = math.max(1, n / target)
        val out = new Array[Byte]((n + stride - 1) / math.max(stride, 1) max 0)
        var i = 0
        var j = 0
        while (i < n && j < out.length) { out(j) = r.bytes(i); i += stride; j += 1 }
        ResizedMedia(r.id, r.media_type, targetW, targetH,
          java.util.Arrays.copyOf(out, j))
      }
    }
  }

  /** Wrap any table into the media schema (text → utf-8 bytes) — the
    * fixture path used by tests and the mm query, since no true binary
    * media table ships with the testdata.
    */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
              mediaType: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(payloadCol).cast("binary").as("bytes"),
        lit(mediaType).as("media_type"))
      .as[MediaRow]
  }
}
