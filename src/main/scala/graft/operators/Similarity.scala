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

  /** Deterministic +/-1 hyperplane matrix for sign-LSH, derived from
    * md5("j,i") per (plane, dim). md5 (not xxhash64) so the DuckDB oracle
    * derives the IDENTICAL matrix; precomputed on the driver and embedded
    * as array literals, so per-row work is one zip_with dot product per
    * plane — no hash evaluation and no sequence() materialization per row.
    */
  def planeSigns(bits: Int, dims: Int): Array[Array[Double]] =
    Array.tabulate(bits, dims) { (j, i) =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$j,$i".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString
      if (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2 == 0) 1.0
      else -1.0
    }

  /** Sign-LSH bucket id from literal hyperplanes. */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      val pl = array(p.toIndexedSeq.map(lit): _*)
      val dot = aggregate(zip_with(vec, pl,
        (x, s) => x.cast(DoubleType) * s), lit(0.0), _ + _)
      when(dot >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Sign-LSH bucket id; `dims` is the embedding dimensionality. */
  def lshBucket(vec: Column, bits: Int, dims: Int): Column =
    lshBucket(vec, planeSigns(bits, dims))

  /** ANN top-k for one query via QUERY-DIRECTED MULTI-PROBE sign-LSH:
    * scan the query's bucket plus the `probes` buckets reached by flipping
    * the lowest-margin hyperplane bits (the planes the query is closest
    * to — where true neighbors most likely landed on the other side).
    * Scan fraction ~ (1+probes)/2^bits of the corpus; recall grows with
    * probes at the caller's chosen cost.
    */
  def lshTopK(df: DataFrame, keyCol: String, vecCol: String,
              query: Seq[Double], k: Int, bits: Int = 4,
              probes: Int = 2): DataFrame = {
    val planes = planeSigns(bits, query.length)
    // query bucket + per-plane margins on the driver — the same in-order
    // arithmetic as the column expression, so buckets agree bit-for-bit
    val dots = planes.map { p =>
      var s = 0.0; var i = 0
      while (i < p.length) { s += query(i) * p(i); i += 1 }
      s
    }
    val qBucket = dots.zipWithIndex
      .map { case (d, j) => if (d >= 0) 1L << j else 0L }.sum
    val flips = dots.zipWithIndex
      .sortBy { case (d, j) => (math.abs(d), j) }
      .take(probes).map(_._2)
    val probeBuckets = qBucket +: flips.map(j => qBucket ^ (1L << j))
    val q = array(query.map(lit): _*)
    df.withColumn("bucket", lshBucket(col(vecCol), planes))
      .filter(col("bucket").isin(probeBuckets.toIndexedSeq: _*))
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
  /** Deterministic centroid sample: the k rows with the smallest
    * md5-derived key hash — md5 (not xxhash64) so the DuckDB oracle
    * selects the IDENTICAL centroids.
    */
  private[graft] def sampleCentroids(df: DataFrame, keyCol: String,
                                         vecCol: String, k: Int)
      : Array[Array[Double]] = {
    val keyHash = conv(substring(md5(col(keyCol).cast(StringType)), 1, 15),
      16, 10).cast(LongType)
    df.withColumn("__h", keyHash)
      .orderBy(col("__h")).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
  }

  /** Nearest-centroid `__cell` assignment (first maximal cosine wins —
    * the same tie-break the oracle's `ORDER BY score DESC, cell ASC`
    * re-derives), centroids broadcast as literals: a narrow map, no
    * shuffle.
    */
  private[graft] def assignCells(df: DataFrame, vecCol: String,
                                     centroids: Array[Array[Double]])
      : DataFrame = {
    val cLit = array(centroids.toIndexedSeq.map(c =>
      array(c.toIndexedSeq.map(lit): _*)): _*)
    val scores = transform(cLit, c => cosine(col(vecCol), c))
    df.withColumn("__cell", array_position(scores, array_max(scores)) - 1)
  }

  def ivfIndex(df: DataFrame, keyCol: String, vecCol: String,
               k: Int = 16): (DataFrame, Array[Array[Double]]) = {
    val centroids = sampleCentroids(df, keyCol, vecCol, k)
    (assignCells(df, vecCol, centroids), centroids)
  }

  /** K-means-refined IVF index: the md5-strided sample centroids of
    * [[ivfIndex]] are tightened with `iters` distributed Lloyd rounds —
    * assign each vector to its nearest centroid (narrow map, centroids
    * broadcast as literals), recompute each cell's mean (one shuffle of
    * k*dims partial sums via an explode-agg, O(k*dims) rows to the
    * driver). Better-balanced cells mean a query's `probes` cells hold
    * more of the true neighbors at the same scan fraction.
    *
    * Determinism note: the seed centroids and every assignment are exact
    * deterministic expressions; the per-cell MEANS inherit Spark's
    * partition-order float summation, so centroid bits can differ across
    * partitionings in the last ulps — cell boundaries may shift on exact
    * ties but reported scores are always exact cosines of the true
    * vectors. Keep the untrained variant for bit-pinned oracle queries.
    */
  def ivfIndexTrained(df: DataFrame, keyCol: String, vecCol: String,
                      k: Int = 16, iters: Int = 2)
      : (DataFrame, Array[Array[Double]]) = {
    val (_, seed) = ivfIndex(df, keyCol, vecCol, k)
    var centroids = seed
    var it = 0
    while (it < iters) {
      val cLit = array(centroids.toIndexedSeq.map(c => array(c.toIndexedSeq.map(lit): _*)): _*)
      val scores = transform(cLit, c => cosine(col(vecCol), c))
      val assigned = df.select(
        (array_position(scores, array_max(scores)) - 1).as("__cell"),
        col(vecCol).as("__v"))
      val sums = assigned
        .select(col("__cell"), posexplode(col("__v")).as(Seq("__p", "__x")))
        .groupBy(col("__cell"), col("__p"))
        .agg(sum(col("__x").cast(DoubleType)).as("__s"),
          count(lit(1)).as("__n"))
        .collect()
      val next = Array.tabulate(centroids.length)(i => centroids(i).clone())
      sums.foreach { r =>
        val cell = r.getLong(0).toInt
        next(cell)(r.getInt(1)) = r.getDouble(2) / r.getLong(3)
      }
      centroids = next // cells with no members keep their previous centroid
      it += 1
    }
    val cLit = array(centroids.toIndexedSeq.map(c => array(c.toIndexedSeq.map(lit): _*)): _*)
    val scores = transform(cLit, c => cosine(col(vecCol), c))
    (df.withColumn("__cell",
      array_position(scores, array_max(scores)) - 1), centroids)
  }

  /** `precomputedCentroids` (round-7): pass the corpus's committed
    * centroid metadata (e.g. the array [[ivfIndex]]/[[ivfIndexTrained]]
    * returned at corpus-commit time) and the query skips the per-call
    * centroid sampling scan entirely — the scaladocs always promised
    * centroids are corpus metadata; this is the API that honors it.
    */
  def ivfTopK(df: DataFrame, keyCol: String, vecCol: String,
              query: Seq[Double], topK: Int, k: Int = 16,
              probes: Int = 4, trainIters: Int = 0,
              precomputedCentroids: Option[Array[Array[Double]]] = None)
      : DataFrame = {
    val (indexed, centroids) = precomputedCentroids match {
      case Some(c) => (assignCells(df, vecCol, c), c)
      case None =>
        if (trainIters > 0) ivfIndexTrained(df, keyCol, vecCol, k, trainIters)
        else ivfIndex(df, keyCol, vecCol, k)
    }
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
    indexed.filter(col("__cell").isin(cells.toIndexedSeq: _*))
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
    // self-join recompute of the bucketing. Shares Dedup.bucketPairs, so
    // over-cap buckets STAR-expand (O(n) hub links) instead of silently
    // dropping — no silent caps.
    val dims = df.select(size(col(vecCol))).head().getInt(0)
    val withB = df.select(col(keyCol), col(vecCol).as("v"))
      .withColumn("bucket", lshBucket(col("v"), bits, dims))
    val buckets = withB.groupBy(col("bucket"))
      .agg(array_sort(collect_list(
        struct(col(keyCol).as("k"), col("v").as("vec")))).as("ms"))
    Dedup.bucketPairs(buckets, maxBucketSize)
      .select(
        least(col("p.a.k"), col("p.b.k")).as("key_a"),
        greatest(col("p.a.k"), col("p.b.k")).as("key_b"),
        cosine(col("p.a.vec"), col("p.b.vec")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .distinct()
  }

  /** Within-cell candidate pairs with a HOT-CELL CAP — round-7, closing
    * the codebase's one remaining uncapped quadratic (the semantic
    * family's within-cell self-join paid O(|cell|²) cosines on a skewed
    * embedding region — exactly the shape an embedding model produces
    * when it collapses near-identical spam into one region). Cells at or
    * under `maxCellSize` expand to every (key_a < key_b) pair — byte-
    * identical to the plain self-join formulation — while over-cap cells
    * STAR-expand: each member pairs only with the cell's minimum-key
    * member (the hub), O(n) pairs. Hub links preserve connected-component
    * reachability for members whose cosine to the hub crosses the
    * threshold; members similar to each other but NOT to the hub are the
    * star boundary (same boundary [[graft.operators.Dedup.bucketPairs]]
    * documents for text buckets). The cell-size frame is one narrow
    * count-aggregate (k rows or fewer) broadcast back — no new
    * vector-carrying exchange.
    *
    * Input must carry (`__cell`, keyCol, vecCol); output is
    * (key_a, key_b, __va, __vb) with key_a < key_b, cosine NOT yet
    * applied (callers filter at their threshold).
    */
  private[graft] def cellPairs(assigned: DataFrame, keyCol: String,
                               vecCol: String,
                               maxCellSize: Int): DataFrame = {
    val sizes = assigned.groupBy(col("__cell"))
      .agg(count(lit(1)).as("__n"), min(col(keyCol)).as("__hub"))
    val withSize = assigned
      .join(broadcast(sizes), Seq("__cell"))
      .select(col("__cell"), col(keyCol), col(vecCol), col("__n"),
        col("__hub"))
    val small = withSize.filter(col("__n") <= maxCellSize)
    val fullPairs = small
      .select(col("__cell"), col(keyCol).as("key_a"), col(vecCol).as("__va"))
      .join(small.select(col("__cell"), col(keyCol).as("key_b"),
        col(vecCol).as("__vb")), Seq("__cell"))
      .filter(col("key_a") < col("key_b"))
      .select(col("key_a"), col("key_b"), col("__va"), col("__vb"))
    val big = withSize.filter(col("__n") > maxCellSize)
    val hubs = big.filter(col(keyCol) === col("__hub"))
      .select(col("__cell"), col(keyCol).as("key_a"), col(vecCol).as("__va"))
    val starPairs = big.filter(col(keyCol) =!= col("__hub"))
      .select(col("__cell"), col(keyCol).as("key_b"), col(vecCol).as("__vb"))
      .join(hubs, Seq("__cell"))
      .select(col("key_a"), col("key_b"), col("__va"), col("__vb"))
    fullPairs.unionByName(starPairs)
  }

  /** SemDeDup-style SEMANTIC dedup (Abbas et al. 2023, arXiv:2303.09540):
    * partition the embedding space into cells, call two documents
    * duplicates when their cosine within a cell crosses
    * `cosineThreshold`, connect components, keep the min-key
    * representative per component. Cells are the deterministic
    * [[ivfIndex]] assignment (md5-strided seed centroids, no RNG — the
    * DuckDB oracle re-derives the identical partition; first-maximal
    * tie-break both sides). Scale shape: choosing k ~ sqrt(N) bounds
    * expected cell size to ~sqrt(N), so pair work is O(N^1.5) cosines
    * instead of O(N^2), and the only exchange keys vectors by cell
    * (dims*4 bytes each — far lighter than shuffling text). Cross-cell
    * near-duplicates are missed BY CONSTRUCTION — the recall boundary
    * SemDeDup itself accepts; raise k only with the trained index
    * ([[ivfIndexTrained]]) if cell balance degrades. Hot cells are
    * capped (round-7): a cell over `maxCellSize` star-expands through
    * [[cellPairs]] (O(n) hub links) instead of paying O(n²) cosines —
    * the skew an embedding model produces when it collapses
    * near-identical spam into one region no longer scales quadratically.
    * Output: one row per doc — (keyCol, cluster_id, keep), exactly
    * [[Dedup.dedupDecisions]]'s contract.
    */
  def semanticDedup(emb: DataFrame, keyCol: String, vecCol: String,
                    k: Int = 16, cosineThreshold: Double = 0.95,
                    maxIter: Int = 20, strict: Boolean = true,
                    algorithm: String = "hashmin",
                    maxCellSize: Int = 10000): DataFrame = {
    val (assigned, _) = ivfIndex(emb, keyCol, vecCol, k)
    val pairs = cellPairs(assigned, keyCol, vecCol, maxCellSize)
      .filter(cosine(col("__va"), col("__vb")) >= cosineThreshold)
      .select(col("key_a"), col("key_b"))
    Dedup.dedupDecisions(emb.select(col(keyCol)), pairs, keyCol,
      maxIter = maxIter, strict = strict, algorithm = algorithm)
  }

  /** INCREMENTAL semantic dedup — [[Dedup.dedupIncremental]]'s
    * snapshot-over-corpus shape in embedding space: dedup a fresh
    * embedding snapshot against a committed corpus plus itself, corpus
    * priority. Cells come from the CORPUS's deterministic centroid
    * sample ([[sampleCentroids]] — at production scale centroids are
    * corpus metadata committed once, like the incremental text dedup's
    * band keys), and BOTH sides assign to those shared cells, so
    * fresh-corpus candidate pairs are exactly the within-cell pairs. An
    * empty corpus falls back to fresh-derived centroids, making the
    * operator degenerate to [[semanticDedup]]'s decisions (spec-pinned).
    *
    * Semantics (mirroring the text twin): fresh docs form a dup graph
    * (within-cell cosine >= threshold); a fresh component linked to any
    * corpus doc at threshold resolves WHOLESALE to the smallest linked
    * corpus key; unlinked components keep their min-key member. Output:
    * one row per fresh doc (keyCol, keep, dup_of — null for kept).
    * Corpus docs get no rows: their decisions were committed with the
    * corpus. Keys must be disjoint across the two inputs.
    *
    * Scale shape: one exchange per side keyed by cell; the corpus pays
    * its assignment scan per run (precompute it with the corpus, like
    * the band keys) and only same-cell corpus vectors meet a fresh
    * vector. Cross-cell misses are the SemDeDup recall boundary, same
    * as the batch operator.
    */
  def semanticDedupIncremental(corpus: DataFrame, fresh: DataFrame,
                               keyCol: String, vecCol: String,
                               k: Int = 16, cosineThreshold: Double = 0.95,
                               maxIter: Int = 20, strict: Boolean = true,
                               algorithm: String = "hashmin",
                               maxCellSize: Int = 10000,
                               precomputedCentroids:
                                 Option[Array[Array[Double]]] = None)
      : DataFrame = {
    // round-7: committed corpus centroids can be passed in directly —
    // the per-run sampleCentroids scan of the corpus (TakeOrdered over
    // every corpus vector) disappears; DedupSpec pins byte-equality
    // between the recomputed and precomputed paths
    val centroids = precomputedCentroids.getOrElse {
      val fromCorpus = sampleCentroids(corpus, keyCol, vecCol, k)
      if (fromCorpus.nonEmpty) fromCorpus
      else sampleCentroids(fresh, keyCol, vecCol, k)
    }
    val fa = assignCells(fresh, vecCol, centroids)
      .select(col("__cell"), col(keyCol), col(vecCol))
    // hot-cell cap on the CORPUS side of the cross join (round-7): an
    // over-cap corpus cell keeps its minimum-key member plus a
    // deterministic hash-thresholded ~maxCellSize sample — see
    // [[Dedup.capGroups]], the shared formulation. Bounds the
    // fresh×corpus pair work per cell to |fresh_cell| × maxCellSize;
    // the k-row cell-size frame broadcasts.
    val caAll = assignCells(corpus, vecCol, centroids)
      .select(col("__cell"), col(keyCol).as("corpus_key"),
        col(vecCol).as("__vc"))
    val ca = Dedup.capGroups(caAll, Seq("__cell"), "corpus_key",
      maxCellSize, broadcastSizes = true)
    // fresh-internal dup graph + decisions (hot cells star-expand)
    val ffPairs = cellPairs(fa, keyCol, vecCol, maxCellSize)
      .filter(cosine(col("__va"), col("__vb")) >= cosineThreshold)
      .select(col("key_a"), col("key_b"))
    val decisions = Dedup.dedupDecisions(fresh.select(col(keyCol)),
      ffPairs, keyCol, maxIter = maxIter, strict = strict,
      algorithm = algorithm)
    // fresh-corpus links within shared cells; component-level corpus
    // priority exactly as the text twin
    val cross = fa.select(col("__cell"), col(keyCol).as("fresh_key"),
        col(vecCol).as("__va"))
      .join(ca, Seq("__cell"))
      .filter(cosine(col("__va"), col("__vc")) >= cosineThreshold)
      .select(col("fresh_key"), col("corpus_key"))
    val clusterCorpus = cross
      .join(decisions.select(col(keyCol).as("fresh_key"), col("cluster_id")),
        Seq("fresh_key"))
      .groupBy(col("cluster_id"))
      .agg(min(col("corpus_key")).as("corpus_dup"))
    decisions.join(clusterCorpus, Seq("cluster_id"), "left")
      .select(col(keyCol),
        (col("keep") && col("corpus_dup").isNull).as("keep"),
        when(col("corpus_dup").isNotNull, col("corpus_dup"))
          .when(col("cluster_id") =!= col(keyCol), col("cluster_id"))
          .as("dup_of"))
  }
}
