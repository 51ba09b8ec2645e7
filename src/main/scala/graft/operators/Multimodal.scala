package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata. The Spark-side plumbing — schema, batch
  * shape, partition-preserving mapPartitions, column pruning of the binary
  * payload for metadata-only queries — is real; the actual media DECODE is
  * stubbed behind `decodeStub` (no image/audio libs in this container),
  * clearly marked and deterministic so tests are stable.
  */
object Multimodal {

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

  /** STUB — deterministic fake decode: a 16-bin byte histogram standing in
    * for pixel/sample features. A real deployment swaps this single
    * function for an actual codec; everything around it (batching, schema,
    * partitioning) is production plumbing.
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
      .add(StructField("media_features", ArrayType(FloatType), nullable = false))
      .add(StructField("media_resized", ArrayType(FloatType), nullable = false))
      .add(StructField("media_frames", ArrayType(IntegerType), nullable = false))
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      // per-partition init point: a real codec would be constructed HERE,
      // once per task, not per row
      it.map { r =>
        val bytes = if (r.isNullAt(idx)) null else r.getAs[Array[Byte]](idx)
        val features = decodeStub(bytes)
        Row.fromSeq(r.toSeq ++ Seq(
          sniffFormat(bytes),
          if (bytes == null) 0L else bytes.length.toLong,
          features.toSeq,
          resizeStub(features).toSeq,
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
