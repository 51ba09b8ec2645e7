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
  * libs needed. Audio/video (riff) frame handling stays a clearly-marked
  * deterministic stub (the JDK ships no video codec).
  */
object Multimodal {

  final case class ImageFeatures(width: Int, height: Int,
                                 histogram: Array[Float])

  /** REAL decode: PNG/JPEG bytes -> (width, height, 16-bin luminance
    * histogram) through javax.imageio. Returns None for undecodable
    * bytes — callers fall back to the byte-histogram stub.
    */
  def decodeImage(bytes: Array[Byte], bins: Int = 16): Option[ImageFeatures] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
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
        Some(ImageFeatures(w, ht, h))
      }
    } catch { case _: Exception => None }

  /** REAL resize for decoded images: pixel-space box filter down to a
    * gridxgrid mean-luminance thumbnail (the standard downsample kernel).
    */
  def resizeImage(bytes: Array[Byte], grid: Int = 2): Option[Array[Float]] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
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
        Some(out)
      }
    } catch { case _: Exception => None }

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
        // REAL decode for images; deterministic stub features otherwise
        val img =
          if (fmt == "png" || fmt == "jpeg") decodeImage(bytes) else None
        val features = img.map(_.histogram).getOrElse(decodeStub(bytes))
        val resized = img.flatMap(_ => resizeImage(bytes))
          .getOrElse(resizeStub(features))
        Row.fromSeq(r.toSeq ++ Seq(
          fmt,
          if (bytes == null) 0L else bytes.length.toLong,
          img.map(_.width).getOrElse(-1),
          img.map(_.height).getOrElse(-1),
          features.toSeq,
          resized.toSeq,
          frameSampleStub(bytes).toSeq))
      }
    }(Encoders.row(outSchema))
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
