package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata. The Spark-side plumbing — schema, batch
  * shape, partition-preserving mapPartitions, column pruning of the binary
  * payload for metadata-only queries — is real. PNG/JPEG decode, feature
  * extraction (luminance histogram) and resize (pixel-space box filter)
  * are REAL via the JDK's javax.imageio / java.awt.image — no external
  * libs needed; WAV metadata, AVI frame EXTRACTION and uncompressed-DIB
  * (BI_RGB 24bpp) frame PIXEL DECODE are REAL byte arithmetic over the
  * RIFF structure. What remains stubbed: compressed video frames (the
  * JDK ships no video codec — the header says so and the path degrades
  * to byte-level features) and the byte-histogram fallback for unknown
  * formats.
  */
object Multimodal {

  final case class ImageFeatures(width: Int, height: Int,
                                 histogram: Array[Float])

  /** Pixel budget for [[decodeBounded]]: 16 MP ≈ 64 MB of ARGB ints. Web
    * bytes are untrusted — a decompression bomb is a few-KB PNG declaring
    * a huge canvas; the resulting allocation is an OutOfMemoryError (an
    * Error, not an Exception) and would kill the executor, so it must be
    * rejected from the HEADER, before any pixel memory is allocated.
    */
  val MaxPixels: Long = 16L * 1024 * 1024

  /** Bounded decode: reads width/height from the image HEADER via an
    * ImageReader first, rejects anything over `maxPixels`, then decodes
    * the pixels ONCE. All downstream feature/resize paths share the
    * returned BufferedImage (the previous shape decoded the same bytes
    * twice — once for the histogram, once for the resize).
    */
  def decodeBounded(bytes: Array[Byte],
                    maxPixels: Long = MaxPixels)
      : Option[java.awt.image.BufferedImage] = {
    if (bytes == null) return None
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      if (iis == null) return None
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          // header-only: no pixel allocation happens for these two calls
          val w = reader.getWidth(0)
          val h = reader.getHeight(0)
          if (w <= 0 || h <= 0 || w.toLong * h.toLong > maxPixels) None
          else Option(reader.read(0))
        } finally reader.dispose()
      } finally iis.close()
    } catch { case _: Exception => None }
  }

  /** (width, height, `bins`-bin luminance histogram) from a decoded image. */
  def imageFeatures(img: java.awt.image.BufferedImage,
                    bins: Int = 16): ImageFeatures = {
    val h = new Array[Float](bins)
    val w = img.getWidth
    val ht = img.getHeight
    var y = 0
    while (y < ht) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = 0.299 * ((rgb >> 16) & 0xff) +
          0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
        h(math.min((lum * bins / 256.0).toInt, bins - 1)) += 1f
        x += 1
      }
      y += 1
    }
    val n = (w * ht).toFloat
    var j = 0
    while (j < bins) { h(j) /= n; j += 1 }
    ImageFeatures(w, ht, h)
  }

  /** REAL decode: PNG/JPEG bytes -> (width, height, 16-bin luminance
    * histogram), bounded by [[MaxPixels]]. Returns None for undecodable
    * or oversized bytes — callers fall back to the byte-histogram stub.
    */
  def decodeImage(bytes: Array[Byte], bins: Int = 16): Option[ImageFeatures] =
    decodeBounded(bytes).map(imageFeatures(_, bins))

  /** REAL resize for decoded images: pixel-space box filter down to a
    * gridxgrid mean-luminance thumbnail (the standard downsample kernel).
    */
  def resizeDecoded(img: java.awt.image.BufferedImage,
                    grid: Int = 2): Array[Float] = {
    val out = new Array[Float](grid * grid)
    val counts = new Array[Int](grid * grid)
    val w = img.getWidth
    val ht = img.getHeight
    var y = 0
    while (y < ht) {
      val gy = math.min(y * grid / ht, grid - 1)
      var x = 0
      while (x < w) {
        val gx = math.min(x * grid / w, grid - 1)
        val rgb = img.getRGB(x, y)
        val lum = (0.299 * ((rgb >> 16) & 0xff) +
          0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)) / 255.0
        out(gy * grid + gx) += lum.toFloat
        counts(gy * grid + gx) += 1
        x += 1
      }
      y += 1
    }
    var j = 0
    while (j < out.length) {
      if (counts(j) > 0) out(j) /= counts(j); j += 1
    }
    out
  }

  def resizeImage(bytes: Array[Byte], grid: Int = 2): Option[Array[Float]] =
    decodeBounded(bytes).map(resizeDecoded(_, grid))

  /** Magic-byte sniffing — real logic, no stub. */
  def sniffFormat(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.length < 4) "unknown"
    else if ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' &&
      bytes(3) == 'G') "png"
    else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) "jpeg"
    else if (bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F') "riff"
    else if (bytes(0) == '<') "html"
    else "unknown"
  }

  /** STUB for NON-image payloads (html/riff/unknown): a deterministic
    * 16-bin byte histogram standing in for sample features. PNG/JPEG take
    * the real [[decodeImage]] path instead.
    */
  def decodeStub(bytes: Array[Byte], bins: Int = 16): Array[Float] = {
    val h = new Array[Float](bins)
    if (bytes == null) return h
    var i = 0
    while (i < bytes.length) {
      h((bytes(i) & 0xff) * bins / 256) += 1f
      i += 1
    }
    if (bytes.length > 0) { var j = 0; while (j < bins) { h(j) /= bytes.length; j += 1 } }
    h
  }

  /** STUB — "resize": box-filter downsample of a feature vector to
    * `outBins` cells, standing in for image resize. The arithmetic (mean
    * pooling over equal spans) is the real resize kernel shape; only the
    * pixel source behind it is fake.
    */
  def resizeStub(features: Array[Float], outBins: Int = 4): Array[Float] = {
    if (features == null || features.isEmpty) return new Array[Float](outBins)
    val out = new Array[Float](outBins)
    val span = features.length.toDouble / outBins
    var o = 0
    while (o < outBins) {
      val from = math.floor(o * span).toInt
      val until = math.max(math.floor((o + 1) * span).toInt, from + 1)
      var s = 0.0
      var i = from
      while (i < until && i < features.length) { s += features(i); i += 1 }
      out(o) = (s / (until - from)).toFloat
      o += 1
    }
    out
  }

  /** STUB — "frame sampling" for video-shaped blobs: every `stride`-th
    * fixed-size block's first byte, standing in for key-frame extraction.
    */
  def frameSampleStub(bytes: Array[Byte], blockSize: Int = 1024,
                      stride: Int = 4): Array[Int] = {
    if (bytes == null || bytes.isEmpty) Array.empty
    else (0 until bytes.length by blockSize * stride)
      .map(o => bytes(o) & 0xff).toArray
  }

  /** Metadata + features over a binary column in one partition-preserving
    * mapPartitions batch (the Scala analog of a mapInPandas batch UDF:
    * iterator-of-rows in, iterator-of-rows out, model/codec state
    * initialized once per partition, no shuffle).
    */
  def withMediaFeatures(df: DataFrame, binCol: String): DataFrame = {
    val outSchema = df.schema
      .add(StructField("media_format", StringType, nullable = false))
      .add(StructField("media_bytes", LongType, nullable = false))
      .add(StructField("media_width", IntegerType, nullable = false))
      .add(StructField("media_height", IntegerType, nullable = false))
      .add(StructField("media_features", ArrayType(FloatType), nullable = false))
      .add(StructField("media_resized", ArrayType(FloatType), nullable = false))
      .add(StructField("media_frames", ArrayType(IntegerType), nullable = false))
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      // per-partition init point: a real codec would be constructed HERE,
      // once per task, not per row
      it.map { r =>
        val bytes = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        val fmt = sniffFormat(bytes)
        // REAL decode for images — ONCE, size-bounded (decodeBounded
        // rejects decompression bombs from the header); histogram and
        // resize share the decoded pixels. REAL index-based frame
        // extraction + header dimensions for RIFF/AVI video.
        // Deterministic stub otherwise.
        val img =
          if (fmt == "png" || fmt == "jpeg") decodeBounded(bytes) else None
        val avi = if (fmt == "riff") parseAviMeta(bytes) else None
        // sampled key frames, decoded ONCE and shared by every output
        // column; the parsed meta is reused so the RIFF index is walked
        // once per row, not twice
        val aviFrames = avi.map(m => frameSample(m, bytes, stride = 4))
          .getOrElse(Array.empty[Array[Byte]])
        val firstDecoded = avi.flatMap(m =>
          aviFrames.headOption.flatMap(decodeAviFrame(m, _)))
        val features = img.orElse(firstDecoded)
          .map(imageFeatures(_).histogram)
          .getOrElse(decodeStub(bytes))
        val resized = img.orElse(firstDecoded)
          .map(resizeDecoded(_))
          .getOrElse(resizeStub(features))
        val frames = avi match {
          // one Int per sampled frame: REAL pixel decode (integer mean
          // luminance) for uncompressed-DIB and Motion-JPEG streams,
          // first payload byte for codecs the JDK cannot decode
          case Some(m) => aviFrames.map { p =>
            decodeAviFrame(m, p).map(frameMeanLuma).getOrElse(
              if (p.nonEmpty) p(0) & 0xff else -1)
          }.toSeq
          case None => frameSampleStub(bytes).toSeq
        }
        Row.fromSeq(r.toSeq ++ Seq(
          fmt,
          if (bytes == null) 0L else bytes.length.toLong,
          img.map(_.getWidth).orElse(avi.map(_.width)).getOrElse(-1),
          img.map(_.getHeight).orElse(avi.map(_.height)).getOrElse(-1),
          features.toSeq,
          resized.toSeq,
          frames))
      }
    }(Encoders.row(outSchema))
  }

  // ---------------------------------------------------------------- audio

  final case class WavMeta(sampleRate: Int, channels: Int, bitsPerSample: Int,
                           dataBytes: Long, durationMs: Double)

  /** REAL audio metadata: RIFF/WAVE header parsing is pure byte
    * arithmetic — no codec needed. Walks the chunk list (chunks are
    * word-aligned: odd-sized chunks carry one pad byte), reads the
    * `fmt ` fields and the `data` size, and derives the duration. Returns
    * None for anything that is not a well-formed PCM-style WAV header.
    */
  def parseWavMeta(bytes: Array[Byte]): Option[WavMeta] = {
    if (bytes == null || bytes.length < 12) return None
    @inline def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    @inline def u32(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    @inline def tag(o: Int, s: String): Boolean =
      bytes(o) == s.charAt(0) && bytes(o + 1) == s.charAt(1) &&
        bytes(o + 2) == s.charAt(2) && bytes(o + 3) == s.charAt(3)
    if (!tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var rate = -1; var ch = -1; var bits = -1; var dataBytes = -1L
    var off = 12L
    while (off + 8 <= bytes.length) {
      val o = off.toInt
      val size = u32(o + 4)
      if (tag(o, "fmt ") && size >= 16 && off + 8 + 16 <= bytes.length) {
        ch = u16(o + 10)
        rate = u32(o + 12).toInt
        bits = u16(o + 22)
      } else if (tag(o, "data")) {
        // declared size, capped at what is actually present (truncated files)
        dataBytes = math.min(size, bytes.length - off - 8)
      }
      off += 8 + size + (size & 1L) // word alignment: odd chunks pad 1 byte
    }
    if (rate <= 0 || ch <= 0 || bits <= 0 || bits % 8 != 0 || dataBytes < 0) None
    else {
      val bytesPerSec = rate.toLong * ch * (bits / 8)
      Some(WavMeta(rate, ch, bits, dataBytes,
        dataBytes * 1000.0 / bytesPerSec))
    }
  }

  /** Deterministic WAV fixture generator (test/bench input — the
    * deliverable is [[parseWavMeta]]): a canonical 44-byte PCM header plus
    * `nFrames` frames of synthetic PCM derived from the frame index.
    */
  def synthWav(sampleRate: Int, channels: Int, bitsPerSample: Int,
               nFrames: Int): Array[Byte] = {
    val bytesPerFrame = channels * (bitsPerSample / 8)
    val dataSize = nFrames * bytesPerFrame
    val out = new Array[Byte](44 + dataSize)
    @inline def putTag(o: Int, s: String): Unit = {
      var i = 0; while (i < 4) { out(o + i) = s.charAt(i).toByte; i += 1 }
    }
    @inline def put16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    @inline def put32(o: Int, v: Long): Unit = {
      var i = 0
      while (i < 4) { out(o + i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 }
    }
    putTag(0, "RIFF"); put32(4, 36L + dataSize); putTag(8, "WAVE")
    putTag(12, "fmt "); put32(16, 16L)
    put16(20, 1) // PCM
    put16(22, channels)
    put32(24, sampleRate.toLong)
    put32(28, sampleRate.toLong * bytesPerFrame)
    put16(32, bytesPerFrame)
    put16(34, bitsPerSample)
    putTag(36, "data"); put32(40, dataSize.toLong)
    var i = 0
    while (i < dataSize) { out(44 + i) = ((i * 31 + 7) & 0xff).toByte; i += 1 }
    out
  }

  // ---------------------------------------------------------------- video

  /** AVI metadata + REAL frame extraction from the RIFF structure: the
    * `avih` main header (dimensions, frame timing, frame count) and the
    * `idx1` index (per-frame byte ranges inside the `movi` list) are pure
    * byte arithmetic — key-frame SAMPLING needs no codec, it is index
    * lookups + array slices. Uncompressed-DIB frames additionally decode
    * to pixels through [[decodeDibFrame]] and Motion-JPEG frames through
    * the JDK's own JPEG decoder ([[decodeAviFrame]]); other codecs would
    * need a decoder the JDK does not ship and degrade to byte-level
    * features.
    *
    * `frames`/`frameSizes` are absolute (offset, size) pairs of the video
    * chunk payloads ('##dc'/'##db' entries; idx1 offsets are relative to
    * the 'movi' fourcc per the AVI 1.0 convention).
    */
  /** `bitCount`/`compression` come from the video stream's `strf`
    * BITMAPINFOHEADER when present (-1 when the file has none —
    * [[decodeDibFrame]] then reports the frame as undecodable and callers
    * keep the byte-level fallback). compression 0 = BI_RGB, the
    * uncompressed-DIB case a pure byte walk can decode without a codec.
    */
  final case class AviMeta(width: Int, height: Int, microSecPerFrame: Long,
                           totalFrames: Long, frames: Array[Long],
                           frameSizes: Array[Long],
                           bitCount: Int = -1, compression: Long = -1L) {
    def durationMs: Double = totalFrames * microSecPerFrame / 1000.0
  }

  def parseAviMeta(bytes: Array[Byte]): Option[AviMeta] = {
    if (bytes == null || bytes.length < 12) return None
    @inline def u32(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    @inline def tag(o: Int, s: String): Boolean =
      bytes(o) == s.charAt(0) && bytes(o + 1) == s.charAt(1) &&
        bytes(o + 2) == s.charAt(2) && bytes(o + 3) == s.charAt(3)
    if (!tag(0, "RIFF") || !tag(8, "AVI ")) return None
    var usPerFrame = -1L; var total = -1L; var w = -1; var h = -1
    var moviPos = -1L
    var bitCount = -1; var compression = -1L
    // an AVI carries one strf per stream (video BITMAPINFOHEADER, audio
    // WAVEFORMATEX); only the strf following a 'vids' strh is the video one
    var lastStrhVids = false
    val offs = scala.collection.mutable.ArrayBuffer.empty[Long]
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    // depth-capped walk: a crafted file can nest LISTs O(fileSize/12)
    // deep — unbounded recursion would be a StackOverflowError (an Error,
    // not an Exception — the decompression-bomb failure class). Real AVI
    // nests 2-3 levels; 16 is generous.
    def walk(from: Long, until: Long, depth: Int): Unit = {
      if (depth > 16) return
      var off = from
      while (off + 8 <= until) {
        val o = off.toInt
        val size = u32(o + 4)
        if (tag(o, "LIST") && off + 12 <= until) {
          if (tag(o + 8, "movi")) moviPos = o + 8
          walk(off + 12, math.min(until, off + 8 + size), depth + 1)
        } else if (tag(o, "avih") && off + 8 + 40 + 4 <= until) {
          // MainAVIHeader: dwMicroSecPerFrame +0, dwTotalFrames +16,
          // dwWidth +32, dwHeight +36 (all relative to the chunk data)
          usPerFrame = u32(o + 8)
          total = u32(o + 24)
          w = u32(o + 40).toInt
          h = u32(o + 44).toInt
        } else if (tag(o, "strh") && off + 8 + 4 <= until) {
          lastStrhVids = tag(o + 8, "vids")
        } else if (tag(o, "strf") && lastStrhVids && size >= 40 &&
          off + 8 + 40 <= until) {
          // BITMAPINFOHEADER: biBitCount +14 (u16), biCompression +16 (u32)
          bitCount = (bytes(o + 8 + 14) & 0xff) | ((bytes(o + 8 + 15) & 0xff) << 8)
          compression = u32(o + 8 + 16)
          lastStrhVids = false
        } else if (tag(o, "idx1")) {
          val end = math.min(until, off + 8 + size)
          var e = off + 8
          while (e + 16 <= end) {
            val ei = e.toInt
            // video chunk ids end in 'dc' (compressed) / 'db' (bitmap)
            if (bytes(ei + 2) == 'd' &&
              (bytes(ei + 3) == 'c' || bytes(ei + 3) == 'b') && moviPos >= 0) {
              offs += moviPos + u32(ei + 8) + 8
              sizes += u32(ei + 12)
            }
            e += 16
          }
        }
        off += 8 + size + (size & 1L)
      }
    }
    walk(12, bytes.length, 0)
    if (w <= 0 || h <= 0 || usPerFrame <= 0) None
    else Some(AviMeta(w, h, usPerFrame, total, offs.toArray, sizes.toArray,
      bitCount, compression))
  }

  /** REAL pixel decode of an uncompressed-DIB (BI_RGB 24bpp) frame
    * payload: bottom-up BGR rows padded to 4-byte boundaries — pure byte
    * arithmetic, no codec. Returns None when the stream header says the
    * frames are anything else (compressed formats need a codec the JDK
    * does not ship) or the payload is short/oversized ([[MaxPixels]] —
    * same decompression-bomb guard as the image path).
    */
  def decodeDibFrame(m: AviMeta, payload: Array[Byte])
      : Option[java.awt.image.BufferedImage] = {
    if (m.compression != 0L || m.bitCount != 24 || payload == null) return None
    val w = m.width; val h = m.height
    if (w <= 0 || h <= 0 || w.toLong * h.toLong > MaxPixels) return None
    val stride = (w * 3 + 3) & ~3
    if (payload.length < stride.toLong * h) return None
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val rowOff = (h - 1 - y) * stride // bottom-up row order
      var x = 0
      while (x < w) {
        val o = rowOff + x * 3
        val rgb = ((payload(o + 2) & 0xff) << 16) |
          ((payload(o + 1) & 0xff) << 8) | (payload(o) & 0xff)
        img.setRGB(x, y, rgb)
        x += 1
      }
      y += 1
    }
    Some(img)
  }

  /** fourcc 'MJPG' as the little-endian u32 a Motion-JPEG stream carries
    * in biCompression.
    */
  val FourccMjpg: Long =
    ('M' & 0xffL) | (('J' & 0xffL) << 8) | (('P' & 0xffL) << 16) |
      (('G' & 0xffL) << 24)

  /** REAL decode of one sampled AVI frame payload: uncompressed DIB via
    * the pure byte walk ([[decodeDibFrame]]), Motion-JPEG via the bounded
    * ImageIO path — each MJPG '##dc' chunk is a STANDALONE JPEG, and the
    * JDK ships a JPEG decoder (the image path uses it), so the
    * "compressed video needs an external codec" boundary genuinely starts
    * past MJPEG, not at it. Any other codec (cinepak, h264, ...) returns
    * None and callers keep the honest byte-level fallback. The MJPG path
    * inherits [[decodeBounded]]'s header-first decompression-bomb guard.
    */
  def decodeAviFrame(m: AviMeta, payload: Array[Byte])
      : Option[java.awt.image.BufferedImage] =
    if (m.compression == FourccMjpg) decodeBounded(payload)
    else decodeDibFrame(m, payload)

  /** Integer mean luminance of a decoded frame: sum(r+g+b) over all
    * pixels, integer-divided by 3*pixels — exact integer arithmetic, so a
    * SQL oracle over deterministic synthetic frames re-derives it
    * bit-for-bit (no float-summation-order hazard).
    */
  def frameMeanLuma(img: java.awt.image.BufferedImage): Int = {
    val w = img.getWidth; val h = img.getHeight
    var s = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        s += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    (s / (3L * w * h)).toInt
  }

  /** REAL frame sampling: every `stride`-th video frame's payload bytes,
    * sliced out via the idx1 index. Empty for non-AVI bytes.
    */
  def frameSample(bytes: Array[Byte], stride: Int = 4): Array[Array[Byte]] =
    parseAviMeta(bytes) match {
      case Some(m) => frameSample(m, bytes, stride)
      case None    => Array.empty
    }

  /** Overload for callers that already hold the parsed [[AviMeta]] —
    * avoids walking the RIFF index a second time over a potentially large
    * blob (withMediaFeatures parses once for dims and reuses it here).
    */
  def frameSample(m: AviMeta, bytes: Array[Byte],
                  stride: Int): Array[Array[Byte]] =
    m.frames.indices.by(math.max(stride, 1)).flatMap { i =>
      val o = m.frames(i)
      val s = math.min(m.frameSizes(i), bytes.length - o)
      if (o >= 0 && s > 0 && o + s <= bytes.length)
        Some(java.util.Arrays.copyOfRange(bytes, o.toInt, (o + s).toInt))
      else None
    }.toArray

  /** Deterministic AVI fixture generator (the deliverable is
    * [[parseAviMeta]]/[[frameSample]]): RIFF(hdrl(avih) movi(00dc...)
    * idx1) with payloads derived from the frame index.
    */
  def synthAvi(width: Int, height: Int, microSecPerFrame: Int,
               nFrames: Int, frameBytes: Int = 64): Array[Byte] = {
    val avihData = 56
    val hdrl = 4 + (8 + avihData)
    val moviData = 4 + nFrames * (8 + frameBytes)
    val idx1Data = nFrames * 16
    val total = 12 + (8 + hdrl) + (8 + moviData) + (8 + idx1Data)
    val out = new Array[Byte](total)
    @inline def putTag(o: Int, s: String): Unit = {
      var i = 0; while (i < 4) { out(o + i) = s.charAt(i).toByte; i += 1 }
    }
    @inline def put32(o: Int, v: Long): Unit = {
      var i = 0
      while (i < 4) { out(o + i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 }
    }
    putTag(0, "RIFF"); put32(4, total - 8L); putTag(8, "AVI ")
    var p = 12
    putTag(p, "LIST"); put32(p + 4, hdrl); putTag(p + 8, "hdrl")
    val av = p + 12
    putTag(av, "avih"); put32(av + 4, avihData)
    put32(av + 8, microSecPerFrame)
    put32(av + 24, nFrames)
    put32(av + 32, 1) // dwStreams
    put32(av + 40, width); put32(av + 44, height)
    p += 8 + hdrl
    putTag(p, "LIST"); put32(p + 4, moviData); putTag(p + 8, "movi")
    var fp = p + 12
    var i = 0
    while (i < nFrames) {
      putTag(fp, "00dc"); put32(fp + 4, frameBytes)
      var j = 0
      while (j < frameBytes) {
        out(fp + 8 + j) = ((i * 131 + j * 7 + 3) & 0xff).toByte; j += 1
      }
      fp += 8 + frameBytes
      i += 1
    }
    p += 8 + moviData
    putTag(p, "idx1"); put32(p + 4, idx1Data)
    i = 0
    while (i < nFrames) {
      val e = p + 8 + i * 16
      putTag(e, "00dc"); put32(e + 4, 0x10L) // AVIIF_KEYFRAME
      put32(e + 8, 4L + i * (8 + frameBytes)) // relative to 'movi' fourcc
      put32(e + 12, frameBytes)
      i += 1
    }
    out
  }

  /** Deterministic REAL-pixel AVI fixture: a complete
    * RIFF(hdrl(avih, strl(strh 'vids', strf BITMAPINFOHEADER BI_RGB 24))
    * movi(00db...) idx1) file whose frames are genuine bottom-up padded
    * BGR rows. Pixel (x, y) of frame f:
    *   R = (f*17 + x*5  + y*29) % 256
    *   G = (f*59 + x*11 + y*3 ) % 256
    *   B = (f*131 + x*7 + y*13) % 256
    * — chosen so a SQL oracle can re-derive any per-frame statistic from
    * (doc parameters, f, x, y) without walking bytes. Unlike [[synthAvi]]
    * (opaque payloads for index-walk tests), frames from this generator
    * decode through [[decodeDibFrame]].
    */
  def synthAviRgb(width: Int, height: Int, microSecPerFrame: Int,
                  nFrames: Int): Array[Byte] = {
    val stride = (width * 3 + 3) & ~3
    val frameBytes = stride * height
    val avihData = 56; val strhData = 56; val strfData = 40
    val strl = 4 + (8 + strhData) + (8 + strfData)
    val hdrl = 4 + (8 + avihData) + (8 + strl)
    val moviData = 4 + nFrames * (8 + frameBytes)
    val idx1Data = nFrames * 16
    val total = 12 + (8 + hdrl) + (8 + moviData) + (8 + idx1Data)
    val out = new Array[Byte](total)
    @inline def putTag(o: Int, s: String): Unit = {
      var i = 0; while (i < 4) { out(o + i) = s.charAt(i).toByte; i += 1 }
    }
    @inline def put16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    @inline def put32(o: Int, v: Long): Unit = {
      var i = 0
      while (i < 4) { out(o + i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 }
    }
    putTag(0, "RIFF"); put32(4, total - 8L); putTag(8, "AVI ")
    var p = 12
    putTag(p, "LIST"); put32(p + 4, hdrl); putTag(p + 8, "hdrl")
    val av = p + 12
    putTag(av, "avih"); put32(av + 4, avihData)
    put32(av + 8, microSecPerFrame)
    put32(av + 24, nFrames)
    put32(av + 32, 1) // dwStreams
    put32(av + 40, width); put32(av + 44, height)
    val sl = av + 8 + avihData
    putTag(sl, "LIST"); put32(sl + 4, strl); putTag(sl + 8, "strl")
    val sh = sl + 12
    putTag(sh, "strh"); put32(sh + 4, strhData)
    putTag(sh + 8, "vids"); putTag(sh + 12, "DIB ")
    put32(sh + 28, microSecPerFrame) // dwScale
    put32(sh + 32, 1000000L)         // dwRate (frames/sec = rate/scale)
    put32(sh + 40, nFrames)          // dwLength
    val sf = sh + 8 + strhData
    putTag(sf, "strf"); put32(sf + 4, strfData)
    put32(sf + 8, 40L)               // biSize
    put32(sf + 12, width); put32(sf + 16, height) // positive = bottom-up
    put16(sf + 20, 1)                // biPlanes
    put16(sf + 22, 24)               // biBitCount
    put32(sf + 24, 0L)               // biCompression = BI_RGB
    put32(sf + 28, frameBytes)       // biSizeImage
    p += 8 + hdrl
    putTag(p, "LIST"); put32(p + 4, moviData); putTag(p + 8, "movi")
    var fp = p + 12
    var f = 0
    while (f < nFrames) {
      putTag(fp, "00db"); put32(fp + 4, frameBytes) // 'db' = uncompressed
      var y = 0
      while (y < height) {
        val rowOff = fp + 8 + (height - 1 - y) * stride // bottom-up
        var x = 0
        while (x < width) {
          val o = rowOff + x * 3
          out(o) = ((f * 131 + x * 7 + y * 13) % 256).toByte     // B
          out(o + 1) = ((f * 59 + x * 11 + y * 3) % 256).toByte  // G
          out(o + 2) = ((f * 17 + x * 5 + y * 29) % 256).toByte  // R
          x += 1
        }
        y += 1
      }
      fp += 8 + frameBytes
      f += 1
    }
    p += 8 + moviData
    putTag(p, "idx1"); put32(p + 4, idx1Data)
    f = 0
    while (f < nFrames) {
      val e = p + 8 + f * 16
      putTag(e, "00db"); put32(e + 4, 0x10L) // AVIIF_KEYFRAME
      put32(e + 8, 4L + f * (8 + frameBytes)) // relative to 'movi' fourcc
      put32(e + 12, frameBytes)
      f += 1
    }
    out
  }

  /** Deterministic Motion-JPEG AVI fixture: same RIFF skeleton as
    * [[synthAviRgb]] but strf.biCompression = 'MJPG' and each '00dc'
    * chunk is a standalone JPEG (ImageIO-encoded) of the same per-frame
    * pixel formula. JPEG is lossy, so decoded statistics are NOT
    * SQL-re-derivable from the formula — tests golden-pin them instead
    * (the JDK decoder is deterministic for fixed bytes).
    */
  def synthAviMjpeg(width: Int, height: Int, microSecPerFrame: Int,
                    nFrames: Int): Array[Byte] = {
    val jpegs: Array[Array[Byte]] = Array.tabulate(nFrames) { f =>
      val img = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val r = (f * 17 + x * 5 + y * 29) % 256
          val g = (f * 59 + x * 11 + y * 3) % 256
          val b = (f * 131 + x * 7 + y * 13) % 256
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val avihData = 56; val strhData = 56; val strfData = 40
    val strl = 4 + (8 + strhData) + (8 + strfData)
    val hdrl = 4 + (8 + avihData) + (8 + strl)
    // chunks are word-aligned: odd-sized JPEG payloads carry one pad byte
    val chunkSpans = jpegs.map(j => 8 + j.length + (j.length & 1))
    val moviData = 4 + chunkSpans.sum
    val idx1Data = nFrames * 16
    val total = 12 + (8 + hdrl) + (8 + moviData) + (8 + idx1Data)
    val out = new Array[Byte](total)
    @inline def putTag(o: Int, s: String): Unit = {
      var i = 0; while (i < 4) { out(o + i) = s.charAt(i).toByte; i += 1 }
    }
    @inline def put16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    @inline def put32(o: Int, v: Long): Unit = {
      var i = 0
      while (i < 4) { out(o + i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 }
    }
    putTag(0, "RIFF"); put32(4, total - 8L); putTag(8, "AVI ")
    var p = 12
    putTag(p, "LIST"); put32(p + 4, hdrl); putTag(p + 8, "hdrl")
    val av = p + 12
    putTag(av, "avih"); put32(av + 4, avihData)
    put32(av + 8, microSecPerFrame)
    put32(av + 24, nFrames)
    put32(av + 32, 1) // dwStreams
    put32(av + 40, width); put32(av + 44, height)
    val sl = av + 8 + avihData
    putTag(sl, "LIST"); put32(sl + 4, strl); putTag(sl + 8, "strl")
    val sh = sl + 12
    putTag(sh, "strh"); put32(sh + 4, strhData)
    putTag(sh + 8, "vids"); putTag(sh + 12, "MJPG")
    put32(sh + 28, microSecPerFrame) // dwScale
    put32(sh + 32, 1000000L)         // dwRate
    put32(sh + 40, nFrames)          // dwLength
    val sf = sh + 8 + strhData
    putTag(sf, "strf"); put32(sf + 4, strfData)
    put32(sf + 8, 40L)               // biSize
    put32(sf + 12, width); put32(sf + 16, height)
    put16(sf + 20, 1)                // biPlanes
    put16(sf + 22, 24)               // biBitCount
    put32(sf + 24, FourccMjpg)       // biCompression = 'MJPG'
    p += 8 + hdrl
    putTag(p, "LIST"); put32(p + 4, moviData); putTag(p + 8, "movi")
    var fp = p + 12
    val relOffsets = new Array[Long](nFrames)
    var f = 0
    while (f < nFrames) {
      relOffsets(f) = fp - (p + 8) // relative to the 'movi' fourcc
      putTag(fp, "00dc"); put32(fp + 4, jpegs(f).length)
      System.arraycopy(jpegs(f), 0, out, fp + 8, jpegs(f).length)
      fp += chunkSpans(f)
      f += 1
    }
    p += 8 + moviData
    putTag(p, "idx1"); put32(p + 4, idx1Data)
    f = 0
    while (f < nFrames) {
      val e = p + 8 + f * 16
      putTag(e, "00dc"); put32(e + 4, 0x10L) // AVIIF_KEYFRAME
      put32(e + 8, relOffsets(f))
      put32(e + 12, jpegs(f).length)
      f += 1
    }
    out
  }

  /** Parsed AVI metadata + decoded-frame statistics over a binary column:
    * (keyCol, width, height, total_frames, duration_ms, frame_means)
    * where frame_means holds the integer mean luminance of every
    * `stride`-th frame decoded via [[decodeAviFrame]] (DIB byte walk or
    * MJPEG ImageIO; -1 for frames the header marks undecodable). Non-AVI
    * rows yield NULL metadata.
    */
  def videoMeta(df: DataFrame, keyCol: String, binCol: String,
                stride: Int = 4): DataFrame = {
    val parse = udf { b: Array[Byte] =>
      parseAviMeta(b).map { m =>
        val means = frameSample(m, b, stride)
          .map(p => decodeAviFrame(m, p).map(frameMeanLuma).getOrElse(-1))
        (m.width, m.height, m.totalFrames, m.durationMs, means.toSeq)
      }
    }
    df.select(col(keyCol), parse(col(binCol)).as("v"))
      .select(col(keyCol),
        col("v._1").as("width"), col("v._2").as("height"),
        col("v._3").as("total_frames"), col("v._4").as("duration_ms"),
        col("v._5").as("frame_means"))
  }

  /** Parsed WAV metadata over a binary column: (keyCol, sample_rate,
    * channels, bits_per_sample, data_bytes, duration_ms). Non-WAV rows
    * yield NULL metadata (nullable struct from the Option-returning UDF).
    */
  def audioMeta(df: DataFrame, keyCol: String, binCol: String): DataFrame = {
    val parse = udf { b: Array[Byte] =>
      parseWavMeta(b).map(m =>
        (m.sampleRate, m.channels, m.bitsPerSample, m.dataBytes, m.durationMs))
    }
    df.select(col(keyCol), parse(col(binCol)).as("w"))
      .select(col(keyCol),
        col("w._1").as("sample_rate"), col("w._2").as("channels"),
        col("w._3").as("bits_per_sample"), col("w._4").as("data_bytes"),
        col("w._5").as("duration_ms"))
  }

  /** Metadata-only projection — must NOT read/carry the binary payload
    * after the scan (length + format only); used by the pruning test.
    */
  def mediaMeta(df: DataFrame, keyCol: String, binCol: String): DataFrame =
    df.select(col(keyCol),
      length(col(binCol)).cast(LongType).as("media_bytes"),
      when(substring(col(binCol), 1, 1) === lit(Array[Byte]('<')), "html")
        .otherwise("unknown").as("media_format"))
}
