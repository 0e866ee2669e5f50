package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns + typed metadata, with decode / feature-extract as
  * per-partition batch transforms.
  *
  * Image decode is REAL: `decodeImage` runs `javax.imageio` (in-JDK —
  * PNG/JPEG/GIF/BMP) and returns genuinely decoded dimensions and
  * pixels. Multi-frame decode is REAL: `keyframes`/`decodeFrames`
  * extract every frame of an animated GIF (frame count, per-frame
  * dims and pixels) through ImageIO's sequence reader. Audio decode
  * is REAL: `decodeAudio` runs `javax.sound.sampled` (in-JDK —
  * WAV/AIFF/AU) and returns genuinely parsed sample rate / channels /
  * frame count / first PCM sample. Only payloads none of these
  * accept (sniffed by magic bytes / reader lookup) fall back to
  * `fakeDecode`/`sampleFrames`, clearly-marked deterministic stubs
  * for container formats with no in-JDK codec (MP4-style video). The
  * pipeline shape is the Scala analog of `mapInPandas`: one iterator
  * of rows per partition, so decoder init is amortized per partition,
  * not per row.
  */
object Multimodal {

  final case class MediaRow(id: Long, bytes: Array[Byte], media_type: String)
  final case class MediaFeatures(id: Long, media_type: String, n_bytes: Long,
                                 width: Int, height: Int, feature_hash: Long)

  /** STUB decoder — deterministic fake for media with no in-JDK codec
    * (video): dims from byte length, feature hash from content (stands
    * in for an embedding). Image and WAV-audio payloads never reach
    * this (see `decodeFeatures`).
    */
  def fakeDecode(r: MediaRow): MediaFeatures = {
    val n = if (r.bytes == null) 0 else r.bytes.length
    var h = 0xcbf29ce484222325L // FNV-1a over bytes: cheap content hash
    var i = 0
    while (i < n) { h ^= (r.bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    MediaFeatures(r.id, r.media_type, n.toLong,
      width = (n % 640) + 1, height = (n % 480) + 1, feature_hash = h)
  }

  /** True iff the payload starts with a magic ImageIO can decode
    * in-JDK: PNG (89 50 4E 47), JPEG (FF D8 FF), GIF (47 49 46), BMP
    * (42 4D).
    */
  def isImagePayload(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 4 && {
      val b = bytes
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte && b(2) == 0xFF.toByte) ||
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') ||
      (b(0) == 'B' && b(1) == 'M')
    }

  final case class DecodedImage(id: Long, n_bytes: Long, width: Int,
                                height: Int, px00: Long)

  /** REAL image decode (javax.imageio): width/height from the decoded
    * raster and the top-left pixel's 24-bit RGB — values that can only
    * be right if the bytes were actually decoded. Returns None for
    * undecodable payloads.
    */
  def decodeImage(id: Long, bytes: Array[Byte]): Option[DecodedImage] = {
    if (bytes == null || bytes.length == 0) None
    else {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else Some(DecodedImage(id, bytes.length.toLong, img.getWidth, img.getHeight,
        (img.getRGB(0, 0) & 0xffffff).toLong))
    }
  }

  /** Partition-batched typed image decode — the strict path for media
    * known to be images; undecodable payloads are dropped (count them
    * upstream with `isImagePayload` if an audit is needed).
    */
  def decodeImages(media: Dataset[MediaRow]): Dataset[DecodedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // ImageIO plugin registry lookup is per-JVM; per-partition scope
      // here is where a heavier codec would init
      it.flatMap(r => decodeImage(r.id, r.bytes))
    }
  }

  /** Encode a solid-`rgb` `width`×`height` PNG — the deterministic
    * image fixture generator (PNG is lossless, so decoded dims/pixels
    * are bit-exact).
    */
  def pngBytes(width: Int, height: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Partition-batched decode: image payloads (magic-sniffed) get the
    * REAL javax.imageio decode, WAV payloads the REAL
    * javax.sound.sampled decode (audio maps channels→width,
    * sample_rate→height, frames→feature_hash); only video — no in-JDK
    * codec — falls back to the deterministic stub. Runs once per
    * partition with an iterator (decoder init amortized), keeps the
    * pipeline distributed, output is a typed Dataset.
    */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        if (isImagePayload(r.bytes))
          decodeImage(r.id, r.bytes) match {
            case Some(d) => MediaFeatures(r.id, r.media_type, d.n_bytes,
              d.width, d.height, d.px00)
            case None => fakeDecode(r)
          }
        else if (isAudioPayload(r.bytes))
          decodeAudio(r.id, r.bytes) match {
            case Some(a) => MediaFeatures(r.id, r.media_type,
              r.bytes.length.toLong, a.channels, a.sample_rate, a.frames)
            case None => fakeDecode(r)
          }
        else fakeDecode(r)
      }
    }
  }

  /** True iff the payload carries the RIFF/WAVE magic (`RIFF` at 0,
    * `WAVE` at 8) — the container javax.sound.sampled decodes in-JDK.
    */
  def isAudioPayload(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'

  final case class DecodedAudio(id: Long, sample_rate: Int, channels: Int,
                                frames: Long, first_sample: Int)

  /** REAL audio decode (javax.sound.sampled): sample rate, channel
    * count and frame count from the parsed WAV header, plus the first
    * PCM sample of channel 0 (16-bit little-endian signed) from the
    * decoded stream — values that can only be right if the bytes were
    * actually parsed as a WAV file. Returns None for undecodable
    * payloads.
    */
  def decodeAudio(id: Long, bytes: Array[Byte]): Option[DecodedAudio] = {
    if (bytes == null || bytes.length == 0) return None
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val frame = new Array[Byte](math.max(fmt.getFrameSize, 2))
        var got = 0
        while (got < 2) {
          val n = ais.read(frame, got, frame.length - got)
          if (n < 0) return None // shorter than one frame
          got += n
        }
        val s0 = ((frame(0) & 0xff) | (frame(1) << 8)).toShort // LE 16-bit
        Some(DecodedAudio(id, fmt.getSampleRate.toInt, fmt.getChannels,
          ais.getFrameLength, s0.toInt))
      } finally ais.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException |
           _: java.io.IOException => None
    }
  }

  /** Partition-batched typed audio decode — the strict path for media
    * known to be WAV audio (mirrors `decodeImages`).
    */
  def decodeAudios(media: Dataset[MediaRow]): Dataset[DecodedAudio] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(it => it.flatMap(r => decodeAudio(r.id, r.bytes)))
  }

  /** Encode `frames` frames of 16-bit LE signed PCM as a WAV file — the
    * deterministic audio fixture generator (PCM WAV is lossless, so the
    * decoded header fields and samples are bit-exact). Sample k of the
    * interleaved stream is `firstSample + k` (wrapping short arithmetic).
    */
  def wavBytes(sampleRate: Int, channels: Int, frames: Int,
               firstSample: Short): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, channels, true, false)
    val pcm = new Array[Byte](frames * channels * 2)
    var k = 0
    while (k < frames * channels) {
      val v = (firstSample + k).toShort
      pcm(2 * k) = (v & 0xff).toByte
      pcm(2 * k + 1) = ((v >> 8) & 0xff).toByte
      k += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  final case class DecodedFrame(id: Long, frame_index: Int, width: Int,
                                height: Int, px00: Long)

  /** REAL multi-frame decode (javax.imageio): every frame of an
    * animated GIF (or the single frame of PNG/JPEG/BMP) with its
    * decoded dimensions and top-left 24-bit RGB — values that exist
    * only inside the encoded container, so a correct result certifies
    * a genuine per-frame decode. Returns Nil for payloads no ImageIO
    * reader accepts (the truly-unknown-codec case — route those
    * through the [[sampleFrames]] stub).
    */
  def decodeFrames(id: Long, bytes: Array[Byte]): Seq[DecodedFrame] = {
    if (bytes == null || bytes.length == 0) return Nil
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return Nil
      val reader = readers.next()
      try {
        reader.setInput(iis, false)
        val n = reader.getNumImages(true)
        (0 until n).map { i =>
          val img = reader.read(i)
          DecodedFrame(id, i, img.getWidth, img.getHeight,
            (img.getRGB(0, 0) & 0xffffff).toLong)
        }
      } finally reader.dispose()
    } catch {
      case _: java.io.IOException => Nil
    } finally iis.close()
  }

  /** Partition-batched typed keyframe extraction — the REAL path for
    * multi-frame media this JDK can decode: animated GIF (ImageIO
    * sequence reader), motion-JPEG streams ([[mjpegFrames]] — ImageIO
    * alone would silently decode only the first concatenated frame),
    * and single-frame image formats (one frame). The 1→N explode shape
    * with per-partition decoder amortization; payloads with no decoder
    * are dropped (use [[sampleFrames]] for those).
    */
  def keyframes(media: Dataset[MediaRow]): Dataset[DecodedFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      val multiJpeg = r.bytes != null && r.bytes.length >= 4 &&
        r.bytes(0) == 0xFF.toByte && r.bytes(1) == 0xD8.toByte &&
        mjpegStarts(r.bytes).lengthCompare(1) > 0
      if (multiJpeg) mjpegFrames(r.id, r.bytes)
      else decodeFrames(r.id, r.bytes)
    }
  }

  /** Encode `frameRgbs` as a `width`×`height` animated GIF, one solid
    * color per frame — the deterministic multi-frame fixture generator.
    * Each frame carries an explicit 2-entry indexed palette holding its
    * exact color, so the GIF round trip is lossless (no quantization)
    * and [[decodeFrames]] recovers frame count, dims, and per-frame
    * colors bit-exactly.
    */
  def gifBytes(width: Int, height: Int, frameRgbs: Seq[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frameRgbs.foreach { rgb =>
        val cm = new java.awt.image.IndexColorModel(8, 2,
          Array(((rgb >> 16) & 0xff).toByte, 0.toByte),
          Array(((rgb >> 8) & 0xff).toByte, 0.toByte),
          Array((rgb & 0xff).toByte, 0.toByte))
        val img = new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
        // raster default-fills with index 0 = the frame color; write
        // explicitly anyway so the fixture is self-evidently solid
        val g = img.createGraphics()
        g.setColor(new java.awt.Color(rgb))
        g.fillRect(0, 0, width, height)
        g.dispose()
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    out.toByteArray
  }

  /** Frame starts of a motion-JPEG stream (the AVI/HTTP-multipart MJPEG
    * payload convention: concatenated baseline JPEGs). A frame starts at
    * a SOI marker (FF D8 FF) sitting either at offset 0 or directly
    * after an EOI (FF D9) — anchoring starts on the PREVIOUS frame's
    * EOI avoids mis-splitting on FF D8 byte pairs inside entropy-coded
    * scan data or embedded EXIF thumbnails.
    */
  private[graft] def mjpegStarts(bytes: Array[Byte]): Seq[Int] = {
    val out = Seq.newBuilder[Int]
    var i = 0
    while (i + 2 < bytes.length) {
      val soi = bytes(i) == 0xFF.toByte && bytes(i + 1) == 0xD8.toByte &&
        bytes(i + 2) == 0xFF.toByte
      if (soi && (i == 0 ||
          (i >= 2 && bytes(i - 2) == 0xFF.toByte && bytes(i - 1) == 0xD9.toByte)))
        out += i
      i += 1
    }
    out.result()
  }

  /** REAL motion-JPEG decode: split the stream on frame boundaries
    * ([[mjpegStarts]]) and decode each slice through ImageIO's JPEG
    * reader — frame count, dimensions, and pixels all come out of the
    * actual entropy-coded payload. Slices ImageIO rejects are dropped
    * (a torn tail frame in a truncated capture; the per-slice catch is
    * NonFatal, not just IOException — the JPEG plugin throws
    * RuntimeExceptions like CMMException on broken ICC profiles and
    * NegativeArraySizeException on corrupt headers, and a torn
    * mid-stream frame must not fail the whole task). Surviving frames
    * re-index CONTIGUOUSLY from 0 (the [[decodeFrames]] contract: a
    * dropped middle slice never leaves a gap in frame_index). Returns
    * Nil for payloads that are not MJPEG at all (no SOI at offset 0).
    */
  def mjpegFrames(id: Long, bytes: Array[Byte]): Seq[DecodedFrame] = {
    if (bytes == null || bytes.length < 4) return Nil
    val starts = mjpegStarts(bytes)
    if (starts.isEmpty || starts.head != 0) return Nil
    val bounds = starts :+ bytes.length
    bounds.sliding(2).flatMap { case Seq(a, b) =>
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(
            java.util.Arrays.copyOfRange(bytes, a, b)))
        if (img == null) None
        else Some((img.getWidth, img.getHeight,
          (img.getRGB(0, 0) & 0xffffff).toLong))
      } catch { case scala.util.control.NonFatal(_) => None }
    }.zipWithIndex.map { case ((w, h, rgb), i) =>
      DecodedFrame(id, i, w, h, rgb)
    }.toSeq
  }

  /** Deterministic MJPEG fixture generator: each frame encoded through
    * ImageIO's JPEG writer (quality 1.0), concatenated. JPEG is lossy —
    * specs assert frame count/dims exactly and colors within the DCT
    * rounding band, unlike the lossless [[gifBytes]] fixture.
    */
  def mjpegBytes(width: Int, height: Int, frameRgbs: Seq[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    frameRgbs.foreach { rgb =>
      val img = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(rgb))
      g.fillRect(0, 0, width, height)
      g.dispose()
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("jpeg").next()
      val ios = javax.imageio.ImageIO.createImageOutputStream(out)
      try {
        writer.setOutput(ios)
        val p = writer.getDefaultWriteParam
        p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        p.setCompressionQuality(1.0f)
        writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
      } finally {
        writer.dispose()
        ios.close()
      }
    }
    out.toByteArray
  }

  /** Frame-sample stub for truly unknown codecs (no ImageIO reader —
    * e.g. real video containers, which have no in-JDK decoder): pick
    * every `stride`-th 1 KiB chunk of the blob as a "frame". Decodable
    * multi-frame media should use [[keyframes]] — the real path. Shows
    * the 1→N explode shape with bounded memory.
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
