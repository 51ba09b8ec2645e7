package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Deduplication operators for training-data pipelines. All are
  * deterministic (hash-seeded, no RNG at run time) and designed around
  * shuffle economics:
  *
  *  - exact:     one shuffle on the 16-byte fingerprint (never on raw text)
  *  - minhash:   explode -> per-doc signature agg (map-side combinable) ->
  *               band-bucket self-join restricted to skew-capped buckets
  *  - simhash:   per-row 64-bit signature (no shuffle) -> pigeonhole chunk
  *               join for hamming<=k candidates
  *  - jaccard:   inverted-index join with a document-frequency cap so hot
  *               shingles (the skew killers at 100 TB) never explode a join
  */
object Dedup {

  /** Intermediates persisted by the dedup operators (collapsed reps,
    * candidate sets). The persists are load-bearing — each is referenced
    * by several downstream stages and bench passes reuse them across
    * calls via plan identity — but a long-lived session would otherwise
    * accumulate cached blocks per call, so every persist is registered
    * here and a caller that is done with the RESULTS (e.g. after writing
    * them to storage) releases them with [[releaseCaches]]. (The
    * connected-components loops use localCheckpoint instead; their
    * blocks are released by the ContextCleaner once unreferenced.)
    */
  private val trackedCaches =
    java.util.concurrent.ConcurrentHashMap.newKeySet[DataFrame]()

  /** Per-invocation cache scope: DataFrame/plan construction happens on the
    * caller's thread, so a thread-local scope captures exactly the persists
    * of one dedup invocation even when several jobs share a long-lived
    * session from different threads (the JVM-global registry would let one
    * caller's release unpersist another's live intermediates).
    */
  private val scopeCaches =
    new ThreadLocal[java.util.Set[DataFrame]]()

  private def persistTracked(df: DataFrame): DataFrame = {
    df.persist()
    val scoped = scopeCaches.get()
    if (scoped != null) scoped.add(df) else trackedCaches.add(df)
    df
  }

  /** Run `body` with a per-invocation cache scope: every intermediate the
    * dedup operators persist while `body` constructs plans on this thread
    * is unpersisted when `body` returns. Materialize the dedup OUTPUT
    * (write/collect) inside `body` — lazy plans escaping the scope
    * recompute from scratch. Safe for concurrent dedup jobs on separate
    * threads of one session, unlike the global [[releaseCaches]].
    */
  def withCacheScope[T](body: => T): T = {
    val prev = scopeCaches.get()
    val mine = java.util.concurrent.ConcurrentHashMap.newKeySet[DataFrame]()
    scopeCaches.set(mine)
    try body
    finally {
      scopeCaches.set(prev)
      mine.forEach(_.unpersist(false))
    }
  }

  /** Unpersist every intermediate cached by dedup operators OUTSIDE any
    * [[withCacheScope]] since the last release. SESSION-EXCLUSIVE: this
    * drains a JVM-global registry, so in a shared session it may unpersist
    * intermediates of a concurrent unscoped dedup job — concurrent callers
    * must use [[withCacheScope]] instead. Call after the dedup OUTPUT is
    * materialized; lazy plans derived from a dedup result recompute from
    * scratch after this.
    */
  def releaseCaches(): Unit = {
    val it = trackedCaches.iterator()
    while (it.hasNext) { it.next().unpersist(blocking = false); it.remove() }
  }

  /** Word n-gram shingles as a distinct array column. JVM sliding window —
    * the pure-Catalyst formulation (transform over sequence + slice) copies
    * the word array per shingle, O(words^2) per document; this is O(words).
    * Semantics: fewer than n words collapse to one whole-text shingle,
    * duplicates dropped (first occurrence kept).
    */
  def shingles(text: Column, n: Int): Column = {
    val udfFn = udf { ws: Seq[String] =>
      if (ws.length < n) Seq(ws.mkString(" "))
      else {
        val seen = new java.util.LinkedHashSet[String]()
        val arr = ws.toArray
        val sb = new StringBuilder
        var i = 0
        while (i <= arr.length - n) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(arr(i + j))
            j += 1
          }
          seen.add(sb.toString)
          i += 1
        }
        import scala.jdk.CollectionConverters._
        seen.asScala.toSeq
      }
    }
    udfFn(graft.functions.Heuristics.words(text))
  }

  /** Exact dedup: fingerprint = md5(text). Emits the input plus
    * (fingerprint, dup_rank, is_dup); the canonical survivor of each group
    * is the lowest key. One shuffle, on the fingerprint only.
    */
  def exact(df: DataFrame, textCol: String, keyCol: String): DataFrame = {
    val w = Window.partitionBy(col("fingerprint")).orderBy(col(keyCol).asc)
    df.withColumn("fingerprint", md5(coalesce(col(textCol), lit(""))))
      .withColumn("dup_rank", row_number().over(w))
      .withColumn("is_dup", col("dup_rank") > 1)
  }

  /** 64-bit FNV-1a over a string's UTF-16 code units — deterministic on
    * every JVM, used by the signature UDFs below.
    */
  @inline private def fnv64(s: String, seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toInt
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** MinHash signature computed per row in one JVM loop (Kirsch-
    * Mitzenmacher: h_i = h1 + i*h2 simulates i independent hash
    * functions from two base hashes). Narrow, shuffle-free, O(shingles)
    * per doc — at 100 TB this beats the explode-then-64-min-aggregates
    * formulation by orders of magnitude (no 1000x row blowup, no shuffle
    * for the signature stage).
    */
  /** splitmix64 finalizer — derives the second Kirsch-Mitzenmacher base
    * hash from the first by avalanche instead of a second full pass over
    * the shingle chars.
    */
  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def minhashSignatures(df: DataFrame, keyCol: String, textCol: String,
                        numHashes: Int = 64, shingleN: Int = 3): DataFrame = {
    // signature straight from the word array: each shingle's h1 is FNV
    // folded over the window's chars (with ' ' separators) — no shingle
    // String is ever built, and no dedup pass is needed because min over
    // a multiset equals min over its set. h2 = splitmix64(h1)|1 (the old
    // second FNV pass, avalanched instead of recomputed).
    val sigUdf = udf { ws: Seq[String] =>
      val sig = Array.fill(numHashes)(Long.MaxValue)
      val arr = ws.toArray
      @inline def foldWord(h0: Long, w: String): Long = {
        var h = h0
        var i = 0
        while (i < w.length) {
          h ^= w.charAt(i).toInt; h *= 0x100000001b3L; i += 1
        }
        h
      }
      @inline def update(h1: Long): Unit = {
        val h2 = mix64(h1) | 1L
        var i = 0
        while (i < numHashes) {
          val h = h1 + i * h2
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
      if (arr.length < shingleN) {
        // fewer than n words: one whole-text shingle (words joined by ' ')
        var h = 0xcbf29ce484222325L
        var j = 0
        while (j < arr.length) {
          if (j > 0) { h ^= ' '.toInt; h *= 0x100000001b3L }
          h = foldWord(h, arr(j))
          j += 1
        }
        update(h)
      } else {
        var i = 0
        while (i <= arr.length - shingleN) {
          var h = 0xcbf29ce484222325L
          var j = 0
          while (j < shingleN) {
            if (j > 0) { h ^= ' '.toInt; h *= 0x100000001b3L }
            h = foldWord(h, arr(i + j))
            j += 1
          }
          update(h)
          i += 1
        }
      }
      sig.toSeq
    }
    df.select(col(keyCol),
      sigUdf(graft.functions.Heuristics.words(col(textCol))).as("signature"))
  }

  /** MinHash + LSH banding: split the signature into `bands` bands of
    * rows, hash each band to a bucket, self-join docs sharing any bucket,
    * then verify with exact signature overlap (estimated Jaccard).
    * `maxBucketSize` caps degenerate buckets (all-identical spam) so the
    * candidate join cannot quadratically explode on skew.
    */
  /** Candidate pairs per bucket WITHOUT a self-join: group each
    * (band, bucket) into a member list and expand pairs in-expression.
    * The self-join formulation recomputed the whole signature+banding
    * pipeline for each side (6 exchanges, no exchange reuse) and needed a
    * window pass for the skew cap; this is 2 exchanges total.
    *
    * NO SILENT CAPS: buckets over `maxBucketSize` are NOT dropped — they
    * get STAR expansion (min-key hub linked to every other member,
    * O(n) rows) instead of full pair expansion (O(n^2) rows). Every
    * member of a hot bucket stays connected to its cluster; downstream
    * verification still applies per emitted pair. Full expansion of a
    * 10^6-copy spam cluster would be 5*10^11 pairs — exactly the data
    * dedup exists to catch, and exactly what must not OOM the job.
    */
  /** Expects `ms` PRE-SORTED (sort it inside the upstream aggregate, where
    * it runs once per bucket — an array_sort written here would be
    * re-inlined by CollapseProject into every element_at below and
    * re-evaluated O(n^2) times per bucket).
    */
  private[operators] def bucketPairs(buckets: DataFrame,
                                     maxBucketSize: Int): DataFrame = {
    val sorted = col("ms")
    def full = flatten(transform(
      sequence(lit(0), size(col("ms")) - 2),
      i => transform(sequence(i + 1, size(col("ms")) - 1),
        j => struct(element_at(sorted, i + 1).as("a"),
          element_at(sorted, j + 1).as("b")))))
    def star = transform(slice(sorted, lit(2), size(col("ms")) - 1),
      m => struct(element_at(sorted, 1).as("a"), m.as("b")))
    buckets
      .filter(size(col("ms")) >= 2)
      .select(explode(when(size(col("ms")) <= maxBucketSize, full)
        .otherwise(star)).as("p"))
  }

  /** Deterministic hot-GROUP cap shared by every incremental/streaming
    * history-side join (dedupIncremental's corpus band buckets,
    * semanticDedupIncremental's corpus cells, streamingSemanticDedup's
    * seen-state cells): a group of more than `cap` rows keeps its
    * minimum-key row — so the common resolution/adoption target stays
    * stable — plus a deterministic hash-thresholded ~cap sample; groups
    * at or under `cap` pass through byte-identically, so decisions only
    * change on inputs whose groups exceed the cap (the same documented
    * boundary as the text path's star expansion). Bounds the probe-side
    * join work per group to |probe_group| × cap. The size aggregate is
    * narrow (one row per distinct group, map-side combinable);
    * `broadcastSizes` broadcasts it back when the group key space is
    * small (e.g. k ~ √N cells), otherwise the join reuses the group
    * partitioning.
    */
  private[graft] def capGroups(df: DataFrame, groupCols: Seq[String],
                               keyCol: String, cap: Int,
                               broadcastSizes: Boolean = false): DataFrame = {
    val sizes = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__cn"), min(col(keyCol)).as("__cmin"))
    val sz = if (broadcastSizes) broadcast(sizes) else sizes
    df.join(sz, groupCols)
      .filter(col("__cn") <= cap || col(keyCol) === col("__cmin") ||
        pmod(xxhash64(col(keyCol)), lit(1000000L)) <
          lit(1000000L) * cap / col("__cn"))
      .drop("__cn", "__cmin")
  }

  /** Observability for the cap: (band, bucket, size, star_expanded) rows —
    * run this next to a dedup job to see how many buckets exceeded
    * maxBucketSize and were star- rather than full-expanded.
    */
  def lshBucketSizes(df: DataFrame, keyCol: String, textCol: String,
                     numHashes: Int = 64, bands: Int = 16, shingleN: Int = 3,
                     maxBucketSize: Int = 1000): DataFrame = {
    val rows = numHashes / bands
    val sigs = minhashSignatures(df, keyCol, textCol, numHashes, shingleN)
    sigs.select(col(keyCol),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(b, slice(col("signature"), b * rows + 1, lit(rows))
            .cast("string")))).as(Seq("band", "bucket")))
      .groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("size"))
      .withColumn("star_expanded", col("size") > maxBucketSize)
  }

  /** Pre-collapse exact duplicates: one REPRESENTATIVE row per distinct
    * text (minimum key), plus member->representative LINK rows for every
    * collapsed duplicate. A 10^6-copy spam cluster costs 10^6 link rows
    * (not 5*10^11 pairs) and one representative in every downstream
    * near-dup stage — this is what keeps LSH buckets small at 100 TB,
    * because exact duplicates otherwise all land in identical buckets.
    * Shuffles: one narrow hash aggregate on the 16-byte fingerprint
    * (fingerprint, min-key, count — map-side combinable), one fingerprint
    * join attaching the representative's text (the only text-carrying
    * exchange; the old any_value(text) aggregate moved the same bytes but
    * as a SortAggregate with two full sorts), and one narrow fingerprint
    * join for the links.
    *
    * Precondition (shared by every dedup operator): `keyCol` is unique
    * per row (doc ids / urls). Rows duplicating the group-minimum key
    * would each pass the rep filter; the old aggregate formulation
    * collapsed them structurally but emitted duplicate LINK rows for the
    * same input, so duplicate keys were degenerate either way.
    */
  def collapseExact(df: DataFrame, keyCol: String, textCol: String)
      : (DataFrame, DataFrame) = {
    val withFp = df.select(col(keyCol), col(textCol),
      md5(coalesce(col(textCol), lit(""))).as("fingerprint"))
    // round-7: the old formulation aggregated `any_value(textCol)` — a
    // string-typed aggregation buffer, which HashAggregateExec cannot hold
    // (buffers must be mutable fixed-width types), so EVERY dedup operator
    // paid a SortAggregate with two full sorts of text rows by
    // fingerprint. Aggregate only narrow columns (hash aggregate,
    // map-side combinable) and fetch the representative's text back with
    // one fingerprint join — all dup copies are byte-equal, so the rep
    // row's own text is exactly what any_value returned.
    val g = withFp.groupBy(col("fingerprint"))
      .agg(min(col(keyCol)).as("__rep"), count(lit(1)).as("dup_count"))
    val reps = withFp.join(g, Seq("fingerprint"))
      .filter(col(keyCol) === col("__rep"))
      .select(col("fingerprint"), col(keyCol), col(textCol), col("dup_count"))
    val links = withFp.select(col(keyCol), col("fingerprint"))
      .join(reps.select(col("fingerprint"), col(keyCol).as("__rep")),
        Seq("fingerprint"))
      .filter(col(keyCol) =!= col("__rep"))
      .select(col("__rep").as("key_a"), col(keyCol).as("key_b"))
    (reps, links)
  }

  /** LSH candidate pairs with estimated Jaccard (signature overlap) —
    * the shared engine behind [[minhashLshPairs]] (estimate-thresholded)
    * and [[minhashLshDedup]] (exactly verified).
    */
  /** `withEstimates = true` carries each member's full signature into the
    * buckets and emits the signature-overlap estimate per pair (the
    * [[minhashLshPairs]] contract). `false` is the dedup-pipeline path:
    * candidates are exactly verified downstream, so the estimate — and
    * with it the whole signature payload — never needs to shuffle; bucket
    * members are bare keys (the per-band shuffle drops from
    * O(rows x bands x signature) to O(rows x bands x key) bytes).
    */
  private def minhashCandidates(df: DataFrame, keyCol: String, textCol: String,
                                numHashes: Int, bands: Int, shingleN: Int,
                                maxBucketSize: Int,
                                withEstimates: Boolean = true): DataFrame = {
    val rows = numHashes / bands
    val sigs = minhashSignatures(df, keyCol, textCol, numHashes, shingleN)
    // sort INSIDE the aggregate: runs once per bucket and downstream code
    // references the attribute (canonical member order -> the same pair
    // always emits as (min, max), so distinct() dedups across bands)
    if (withEstimates) {
      val banded = sigs.select(col(keyCol), col("signature"),
          posexplode(transform(sequence(lit(0), lit(bands - 1)),
            b => xxhash64(b, slice(col("signature"), b * rows + 1, lit(rows))
              .cast("string")))).as(Seq("band", "bucket")))
      val buckets = banded.groupBy(col("band"), col("bucket"))
        .agg(array_sort(collect_list(
          struct(col(keyCol).as("k"), col("signature").as("sig")))).as("ms"))
      bucketPairs(buckets, maxBucketSize)
        .select(
          least(col("p.a.k"), col("p.b.k")).as("key_a"),
          greatest(col("p.a.k"), col("p.b.k")).as("key_b"),
          (size(filter(zip_with(col("p.a.sig"), col("p.b.sig"),
            (a, b) => a === b), x => x)).cast(DoubleType) /
            lit(numHashes.toDouble)).as("est_jaccard"))
        .distinct()
    } else {
      val banded = bandedKeys(df, keyCol, textCol, numHashes, bands, shingleN)
      val buckets = banded.groupBy(col("band"), col("bucket"))
        .agg(array_sort(collect_list(col(keyCol))).as("ms"))
      bucketPairs(buckets, maxBucketSize)
        .select(least(col("p.a"), col("p.b")).as("key_a"),
          greatest(col("p.a"), col("p.b")).as("key_b"))
        .distinct()
    }
  }

  /** (key, band, bucket) LSH band keys for each document — the keys-only
    * banding shared by the batch candidate generator and the streaming
    * near-dup state store (the streaming operator persists these per
    * batch so future batches can bucket-join against everything seen).
    */
  def bandedKeys(df: DataFrame, keyCol: String, textCol: String,
                 numHashes: Int = 64, bands: Int = 16,
                 shingleN: Int = 3): DataFrame = {
    val rows = numHashes / bands
    minhashSignatures(df, keyCol, textCol, numHashes, shingleN)
      .select(col(keyCol),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(b, slice(col("signature"), b * rows + 1, lit(rows))
            .cast("string")))).as(Seq("band", "bucket")))
      .select(col(keyCol), col("band"), col("bucket"))
  }

  def minhashLshPairs(df: DataFrame, keyCol: String, textCol: String,
                      numHashes: Int = 64, bands: Int = 16,
                      jaccardThreshold: Double = 0.8,
                      shingleN: Int = 3,
                      maxBucketSize: Int = 1000): DataFrame =
    minhashCandidates(df, keyCol, textCol, numHashes, bands, shingleN,
      maxBucketSize)
      .filter(col("est_jaccard") >= jaccardThreshold)

  /** The production dedup shape: exact duplicates pre-collapsed (so spam
    * clusters can't blow up LSH buckets), LSH proposes candidates among
    * the distinct-text representatives, and every candidate is VERIFIED
    * with the exact shingle Jaccard — LSH proposes, it never decides.
    * Output rows:
    *   - (rep_a, rep_b, exact jaccard)  near-dup pairs among representatives
    *   - (rep, member, 1.0)             link rows for collapsed exact dupes
    * Together these are the dup GRAPH (connected components = dup
    * clusters) at O(links + near-pairs) rows — never O(cluster^2).
    */
  def minhashLshDedup(df: DataFrame, keyCol: String, textCol: String,
                      numHashes: Int = 64, bands: Int = 16,
                      jaccardThreshold: Double = 0.8,
                      shingleN: Int = 3,
                      maxBucketSize: Int = 1000): DataFrame = {
    // persist the collapsed representatives: they feed signature
    // generation, the verify-stage shingle projection and the link join —
    // without it each consumer re-runs the collapse aggregate (which
    // shuffles one text copy per distinct fingerprint). Materializing the
    // collapsed corpus is the standard checkpoint of a production dedup
    // DAG; at cluster scale this would be an explicit storage checkpoint.
    val (reps0, links) = collapseExact(df, keyCol, textCol)
    val reps = persistTracked(reps0)
    lshVerifiedGraph(reps, links, keyCol, textCol, numHashes, bands,
      jaccardThreshold, shingleN, maxBucketSize)
  }

  /** The candidate + exact-verify stages of [[minhashLshDedup]] over an
    * already-collapsed representative set — shared with
    * [[dedupIncremental]], which runs the same graph on a fresh snapshot
    * before linking it against the committed corpus.
    */
  /** `preBanded` (round-7): a caller that already materialized the reps'
    * (key, band, bucket) rows — [[dedupIncremental]] needs them for the
    * cross join anyway — passes them in, so the signature UDF and band
    * explode run ONCE per fresh rep instead of once per consumer.
    */
  private def lshVerifiedGraph(reps: DataFrame, links: DataFrame,
                               keyCol: String, textCol: String,
                               numHashes: Int, bands: Int,
                               jaccardThreshold: Double, shingleN: Int,
                               maxBucketSize: Int,
                               preBanded: Option[DataFrame] = None)
      : DataFrame = {
    // persist: the candidate set is referenced three times below (two
    // verify joins + the key-set prefilter); it is O(near-dup pairs) —
    // tiny relative to the corpus — so materializing it once is cheap
    // and avoids re-running signature generation per reference.
    val banded = preBanded.getOrElse(
      bandedKeys(reps, keyCol, textCol, numHashes, bands, shingleN))
    val buckets = banded.groupBy(col("band"), col("bucket"))
      .agg(array_sort(collect_list(col(keyCol))).as("ms"))
    val cand = persistTracked(
      bucketPairs(buckets, maxBucketSize)
        .select(least(col("p.a"), col("p.b")).as("key_a"),
          greatest(col("p.a"), col("p.b")).as("key_b"))
        .distinct())
    // exact verification: join candidates (a small table) back to the
    // representatives' shingle sets — true Jaccard, not the estimate.
    // Semi-join prefilter first: only representatives that actually appear
    // in a candidate pair get shingled. At production thresholds candidates
    // are a tiny fraction of documents, so this drops the verify stage's
    // text work by orders of magnitude (shingling the whole corpus to
    // verify a handful of pairs was the round-2 scale gap).
    // no .distinct() on the exploded keys: left_semi dedups by definition,
    // so the extra exchange+aggregate bought nothing (round-7)
    val candKeys = cand
      .select(explode(array(col("key_a"), col("key_b"))).as(keyCol))
    val shs = reps.join(candKeys, Seq(keyCol), "left_semi")
      .select(col(keyCol), shingles(col(textCol), shingleN).as("shs"))
    val inter = size(array_intersect(col("sa"), col("sb"))).cast(DoubleType)
    val verified = cand
      .join(shs.select(col(keyCol).as("key_a"), col("shs").as("sa")), Seq("key_a"))
      .join(shs.select(col(keyCol).as("key_b"), col("shs").as("sb")), Seq("key_b"))
      .withColumn("jaccard", inter /
        (size(col("sa")) + size(col("sb")) - inter).cast(DoubleType))
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("key_a"), col("key_b"), col("jaccard"))
    verified.unionByName(links.withColumn("jaccard", lit(1.0)))
  }

  /** INCREMENTAL near-dup dedup — the recurring-crawl production shape:
    * dedup a NEW snapshot against an already-committed corpus plus
    * itself, touching the corpus only to derive its fingerprints and LSH
    * band keys (both precomputable at corpus-commit time — the streaming
    * near-dup operator persists exactly these as its state tables; at
    * 100 TB they are corpus metadata you store once, not a per-run scan).
    * This fills the modality gap between [[dedupResumable]] (restart ONE
    * run) and [[graft.streaming.EventStream.streamingNearDupDedup]]
    * (per-event ingest): batch snapshot-over-snapshot, e.g. a monthly
    * crawl against the accumulated corpus.
    *
    * Semantics (corpus priority, mirroring the streaming operator's
    * seen-state rule): fresh docs form a dup graph exactly as
    * [[minhashLshDedup]] (exact collapse + LSH-proposed, exactly-verified
    * near pairs); a fresh component linked to >= 1 corpus doc — by byte
    * equality (fingerprint) or verified jaccard >= threshold — drops
    * WHOLESALE with `dup_of` = the smallest linked corpus key (bridge
    * members drop too, same boundary the streaming scaladoc documents);
    * unlinked components keep their min-key member, the rest drop with
    * `dup_of` = that member. Output: one row per fresh doc
    * (keyCol, keep, dup_of — null for kept docs). Corpus docs get no
    * rows: their decisions were committed when the corpus was.
    *
    * Scale shape: the corpus is exact-collapsed before banding (a spam
    * cluster costs one banded rep, and linking to a rep is linking to
    * the whole byte-equal group); cross candidates are (band, bucket)
    * key-only joins — no text shuffles; only candidate keys are shingled
    * (semi-join prefilter, both sides). The fresh×corpus bucket join is
    * CAPPED (round-7): an over-`maxBucketSize` (band, bucket) keeps its
    * minimum corpus key plus a deterministic hash-thresholded
    * ~maxBucketSize sample of the rest, bounding pair work to
    * |f|×maxBucketSize per bucket — under-cap buckets (every gate/spec
    * corpus) are byte-identical, and a skewed bucket's divergence (some
    * corpus links unseen) mirrors the batch operator's star-expansion
    * boundary. Keys must be disjoint across the two inputs (same key
    * space, e.g. url).
    *
    * Bloom prefilter (the per-run scale lever): the fresh snapshot is
    * the SMALL side of both cross joins — a daily crawl vs the
    * accumulated corpus — so driver-built Bloom filters over the fresh
    * side's join keys (fingerprint hash; band-bucket hash) cut the
    * corpus side BEFORE its rows reach an exchange: a corpus rep whose
    * fingerprint / band bucket cannot match any fresh doc drops at the
    * scan and never pays the shuffle. A Bloom filter has false
    * POSITIVES only, and both joins decide exactly downstream
    * (fingerprint equality; verified shingle jaccard), so decisions are
    * bit-identical with the prefilter on or off — DedupSpec pins the
    * equivalence, PlanSpec pins the filter sitting below the exchange.
    * Sizing: ~7.3 bits/item at the 3% default fpp — 10^8 fresh reps ≈
    * 87 MB for the fingerprint filter and `bands`× that for band keys —
    * so each filter only builds while its item count (band side:
    * nReps·bands) stays under `bloomMaxItems`; beyond that the operator
    * falls back to the unfiltered join for that path. `bloomFpp <= 0`
    * disables both. Costs one `count()` + one aggregation pass over the
    * (persisted) fresh reps at plan-construction time.
    */
  /** Precomputed corpus metadata for [[dedupIncremental]] — the frames
    * its scaladoc promises are "committed corpus metadata":
    * (fingerprints, band keys) of the corpus's exact-collapse
    * representatives, i.e. (keyCol, fingerprint) and
    * (keyCol, band, bucket). Write both at corpus-commit time and pass
    * them back via `corpusMeta`; each run then touches corpus TEXT only
    * to shingle verified candidates (a semi-join-pruned scan) instead of
    * re-collapsing and re-banding the whole corpus per run. DedupSpec
    * pins byte-equality between the recomputed and precomputed paths.
    *
    * The metadata is only valid under the (numHashes, bands, shingleN)
    * it was computed with: band keys from drifted parameters match
    * nothing, silently dropping every near-dup cross link. Commit the
    * parameters next to the frames and guard the read (the `graft.Main
    * dedup --corpus-meta` path writes and checks a `_PARAMS` record,
    * mirroring [[dedupResumable]]'s guard).
    */
  def corpusDedupMeta(corpus: DataFrame, keyCol: String, textCol: String,
                      numHashes: Int = 64, bands: Int = 16,
                      shingleN: Int = 3): (DataFrame, DataFrame) = {
    val creps = persistTracked(collapseExact(corpus, keyCol, textCol)._1)
    (creps.select(col(keyCol), col("fingerprint")),
      bandedKeys(creps.select(col(keyCol), col(textCol)), keyCol, textCol,
        numHashes, bands, shingleN))
  }

  def dedupIncremental(corpus: DataFrame, fresh: DataFrame,
                       keyCol: String, textCol: String,
                       numHashes: Int = 64, bands: Int = 16,
                       jaccardThreshold: Double = 0.8,
                       shingleN: Int = 3,
                       maxBucketSize: Int = 1000,
                       maxIter: Int = 20, strict: Boolean = true,
                       algorithm: String = "hashmin",
                       bloomFpp: Double = 0.03,
                       bloomMaxItems: Long = 200000000L,
                       corpusMeta: Option[(DataFrame, DataFrame)] = None)
      : DataFrame = {
    // fresh-internal dup graph + decisions: the batch pipeline — with
    // the fresh reps' band keys materialized ONCE (round-7) and shared
    // between the fresh-internal candidate generation and the cross
    // join below (the old shape ran the signature UDF + band explode
    // twice over every fresh rep)
    val (reps0, links) = collapseExact(fresh, keyCol, textCol)
    val reps = persistTracked(reps0)
    val fBandsRaw = persistTracked(
      bandedKeys(reps.select(col(keyCol), col(textCol)),
        keyCol, textCol, numHashes, bands, shingleN))
    val freshPairs = lshVerifiedGraph(reps, links, keyCol, textCol,
      numHashes, bands, jaccardThreshold, shingleN, maxBucketSize,
      preBanded = Some(fBandsRaw))
    val decisions = persistTracked(
      dedupDecisions(fresh, freshPairs.select("key_a", "key_b"), keyCol,
        maxIter = maxIter, strict = strict, algorithm = algorithm))
    // corpus side: exact-collapse + band the representatives — or, when
    // the caller supplies committed corpus metadata (round-7,
    // [[corpusDedupMeta]]), read fingerprints and band keys from it and
    // touch corpus text only for the candidate shingle pass below
    val (cFps, cBandsSrc, cTextSrc) = corpusMeta match {
      case Some((fps, bnds)) =>
        (fps.select(col(keyCol), col("fingerprint")),
          bnds.select(col(keyCol), col("band"), col("bucket"))
            .withColumnRenamed(keyCol, "corpus_key"),
          corpus.select(col(keyCol), col(textCol)))
      case None =>
        val creps = persistTracked(collapseExact(corpus, keyCol, textCol)._1)
        (creps.select(col(keyCol), col("fingerprint")),
          bandedKeys(creps.select(col(keyCol), col(textCol)), keyCol,
            textCol, numHashes, bands, shingleN)
            .withColumnRenamed(keyCol, "corpus_key"),
          creps.select(col(keyCol), col(textCol)))
    }
    // Bloom prefilters over the fresh side's join keys (see scaladoc):
    // built eagerly here (reps is persisted, so the count materializes
    // work the joins below need anyway), probed on the corpus side
    // below each exchange. Both paths hash to a long first so one
    // primitive-typed probe serves fingerprints and band buckets.
    val session = fresh.sparkSession
    val nReps = reps.count()
    def bloomProbe(keys: DataFrame, expected: Long): Column => Column = {
      val bloom = keys.stat.bloomFilter("h", math.max(expected, 1L), bloomFpp)
      val bc = session.sparkContext.broadcast(bloom)
      val probe = udf((h: Long) => bc.value.mightContainLong(h))
        .withName("bloom_might_contain")
      h => probe(h)
    }
    // byte-equal cross links by fingerprint — also catches texts whose
    // shingle sets are empty (null/blank), where jaccard is undefined
    val crepsForExact = if (bloomFpp > 0 && nReps <= bloomMaxItems) {
      val keep = bloomProbe(
        reps.select(xxhash64(col("fingerprint")).as("h")), nReps)
      cFps.filter(keep(xxhash64(col("fingerprint"))))
    } else cFps
    val exactCross = reps
      .select(col(keyCol).as("fresh_key"), col("fingerprint"))
      .join(crepsForExact
          .select(col(keyCol).as("corpus_key"), col("fingerprint")),
        Seq("fingerprint"))
      .select(col("fresh_key"), col("corpus_key"))
    // near cross links: shared band buckets propose (keys only), exact
    // shingle jaccard decides — LSH proposes, it never decides
    val fBands = fBandsRaw.withColumnRenamed(keyCol, "fresh_key")
    val cBands = persistTracked(
      if (bloomFpp > 0 && nReps * bands <= bloomMaxItems) {
        val keep = bloomProbe(
          fBands.select(xxhash64(col("band"), col("bucket")).as("h")),
          nReps * bands)
        cBandsSrc.filter(keep(xxhash64(col("band"), col("bucket"))))
      } else cBandsSrc)
    // hot-bucket cap on the corpus side (round-7, closing the scaladoc's
    // documented boundary): exact collapse bounds STRUCTURAL hot buckets,
    // but a pathological non-identical bucket previously paid |f|×|c|
    // pairs — see [[capGroups]]. The count aggregate and both joins key
    // on (band, bucket), so the planner reuses one partitioning across
    // all three (no broadcastSizes: the bucket key space is large).
    val cBandsCapped = capGroups(cBands, Seq("band", "bucket"),
      "corpus_key", maxBucketSize)
    val crossCand = fBands.join(cBandsCapped, Seq("band", "bucket"))
      .select(col("fresh_key"), col("corpus_key")).distinct()
    // semi-join prefilters need no .distinct() on the probe side (round-7)
    val fShs = reps
      .join(crossCand.select(col("fresh_key").as(keyCol)),
        Seq(keyCol), "left_semi")
      .select(col(keyCol).as("fresh_key"),
        shingles(col(textCol), shingleN).as("sa"))
    val cShs = cTextSrc
      .join(crossCand.select(col("corpus_key").as(keyCol)),
        Seq(keyCol), "left_semi")
      .select(col(keyCol).as("corpus_key"),
        shingles(col(textCol), shingleN).as("sb"))
    val inter = size(array_intersect(col("sa"), col("sb"))).cast(DoubleType)
    val crossNear = crossCand
      .join(fShs, Seq("fresh_key")).join(cShs, Seq("corpus_key"))
      .withColumn("jaccard", inter /
        (size(col("sa")) + size(col("sb")) - inter).cast(DoubleType))
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("fresh_key"), col("corpus_key"))
    // component-level corpus priority: links land on fresh REPS, and a
    // rep's link covers its byte-equal members through the component
    val clusterCorpus = exactCross.unionByName(crossNear)
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

  /** What a resumable dedup run did: which stages computed this run and
    * which were restored from committed checkpoints.
    */
  final case class ResumeReport(ran: Seq[String], skipped: Seq[String])

  /** Checkpoint-resumable dedup DAG — the long multi-stage job a
    * preemption actually kills at 100 TB. The quality filter already has
    * bucket-level resume (operators/Resume); this is the same commit
    * protocol applied to the dedup pipeline's stage boundaries:
    *
    *   reps -> links -> cand -> pairs -> decisions
    *
    * Each stage materializes as one atomic parquet job whose `_SUCCESS`
    * marker is the commit record (production shape: an Iceberg snapshot
    * per stage); a restarted run reads every committed stage from storage
    * and recomputes only from the first uncommitted one. Every stage is a
    * deterministic function of the input (md5 fingerprints, xxhash band
    * buckets, canonical (min,max) pair order), so resuming from any
    * committed prefix yields byte-identical decisions — DedupSpec proves
    * it with a kill between stages.
    *
    * `stageDir` is keyed to ONE input corpus: rerunning against different
    * input requires a fresh stage dir (delete or change the path). The
    * PARAMETERS of a run are guarded loudly, not by documentation: the
    * first run commits a `_PARAMS` record of every semantic knob (plus
    * the caller's `inputTag` — e.g. the pipeline's classifier-gate
    * threshold, which changes the input set), and a resume against a
    * stage dir committed under different parameters fails by name
    * instead of silently reusing stages computed under the old policy
    * (production shape: the same record as Iceberg table properties).
    * `failAfter` injects a crash after N stage commits (for tests).
    */
  def dedupResumable(docs: DataFrame, keyCol: String, textCol: String,
                     stageDir: String,
                     jaccardThreshold: Double = 0.8,
                     numHashes: Int = 64, bands: Int = 16,
                     shingleN: Int = 3, maxBucketSize: Int = 1000,
                     maxIter: Int = 20, strict: Boolean = true,
                     algorithm: String = "hashmin",
                     failAfter: Int = Int.MaxValue,
                     inputTag: String = "")
      : (DataFrame, ResumeReport) = {
    val spark = docs.sparkSession
    val paramsLine = Seq(
      s"keyCol=$keyCol", s"textCol=$textCol",
      s"jaccardThreshold=$jaccardThreshold", s"numHashes=$numHashes",
      s"bands=$bands", s"shingleN=$shingleN",
      s"maxBucketSize=$maxBucketSize", s"maxIter=$maxIter",
      s"strict=$strict", s"algorithm=$algorithm",
      s"inputTag=$inputTag").mkString(";")
    // _PARAMS and _SUCCESS probes go through Hadoop's FileSystem (round-7
    // ADVICE fix): java.io.File silently reported "missing" on any
    // non-local default FS, making the parameter-drift guard inert
    // exactly where the stage data lives
    val hconf = spark.sparkContext.hadoopConfiguration
    val paramsPath = s"$stageDir/_PARAMS"
    if (graft.sources.Fs.exists(paramsPath, hconf)) {
      val committed = graft.sources.Fs.readString(paramsPath, hconf)
      require(committed == paramsLine,
        s"dedupResumable: stage dir $stageDir was committed with " +
          s"different parameters.\n  committed: $committed\n  " +
          s"requested: $paramsLine\nResuming would silently mix stages " +
          "computed under the old policy — use a fresh stage dir (or " +
          "delete this one) to change parameters.")
    } else {
      graft.sources.Fs.writeString(paramsPath, paramsLine, conf = hconf)
    }
    val ran = scala.collection.mutable.Buffer.empty[String]
    val skipped = scala.collection.mutable.Buffer.empty[String]
    def stage(name: String)(compute: => DataFrame): DataFrame = {
      val path = s"$stageDir/$name"
      if (graft.sources.Fs.exists(s"$path/_SUCCESS", hconf)) {
        skipped += name
      } else {
        if (ran.size >= failAfter)
          throw new RuntimeException(s"injected failure before stage $name")
        compute.write.mode("overwrite").parquet(path)
        ran += name
      }
      // committed stages are read back from storage, so no stage's plan
      // carries lineage into an earlier one — a restart never recomputes
      // upstream work through a downstream plan
      spark.read.parquet(path)
    }

    val reps = stage("reps") { collapseExact(docs, keyCol, textCol)._1 }
    val links = stage("links") {
      // recompute only the narrow per-row fingerprint (no shuffle) and
      // join it to the committed representatives
      docs.select(col(keyCol),
          md5(coalesce(col(textCol), lit(""))).as("fingerprint"))
        .join(reps.select(col("fingerprint"), col(keyCol).as("__rep")),
          Seq("fingerprint"))
        .filter(col(keyCol) =!= col("__rep"))
        .select(col("__rep").as("key_a"), col(keyCol).as("key_b"))
    }
    val cand = stage("cand") {
      minhashCandidates(reps, keyCol, textCol, numHashes, bands, shingleN,
        maxBucketSize, withEstimates = false)
    }
    val pairs = stage("pairs") {
      val candKeys = cand
        .select(explode(array(col("key_a"), col("key_b"))).as(keyCol))
      val shs = reps.join(candKeys, Seq(keyCol), "left_semi")
        .select(col(keyCol), shingles(col(textCol), shingleN).as("shs"))
      val inter = size(array_intersect(col("sa"), col("sb"))).cast(DoubleType)
      cand
        .join(shs.select(col(keyCol).as("key_a"), col("shs").as("sa")),
          Seq("key_a"))
        .join(shs.select(col(keyCol).as("key_b"), col("shs").as("sb")),
          Seq("key_b"))
        .withColumn("jaccard", inter /
          (size(col("sa")) + size(col("sb")) - inter).cast(DoubleType))
        .filter(col("jaccard") >= jaccardThreshold)
        .select(col("key_a"), col("key_b"), col("jaccard"))
        .unionByName(links.withColumn("jaccard", lit(1.0)))
    }
    val decisions = stage("decisions") {
      dedupDecisions(docs, pairs.select("key_a", "key_b"), keyCol,
        maxIter = maxIter, strict = strict, algorithm = algorithm)
    }
    (decisions, ResumeReport(ran.toSeq, skipped.toSeq))
  }

  /** 64-bit SimHash over word unigrams. Per-row JVM loop (one pass over
    * the words, 64 counters) — the equivalent Catalyst expression tree
    * (64 x aggregate-over-words) is quadratic in plan size and falls out
    * of codegen; measured 50x slower. Narrow and shuffle-free either way.
    */
  val simhashUdf = udf { ws: Seq[String] =>
    val counts = new Array[Int](64)
    ws.foreach { w =>
      val h = fnv64(w, 0L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  def simhash(text: Column): Column =
    simhashUdf(graft.functions.Heuristics.words(text))

  /** SimHash near-dup candidate pairs with hamming distance <= maxHamming,
    * found by the pigeonhole trick: split 64 bits into (maxHamming+1)
    * 16-bit-ish chunks — any pair within distance k agrees on >=1 chunk —
    * join on (chunk index, chunk value), verify with bit_count(xor).
    */
  /** Note the chunk-width/selectivity tradeoff: pigeonhole needs
    * maxHamming+1 chunks, so large maxHamming means narrow chunks and
    * coarse buckets (maxHamming=8 -> 7-bit chunks -> 128 bucket values —
    * degenerate at any scale). Keep maxHamming small (<=3) and let
    * maxBucketSize bound the worst buckets.
    */
  def simhashPairs(df: DataFrame, keyCol: String, textCol: String,
                   maxHamming: Int = 3,
                   maxBucketSize: Int = 1000): DataFrame = {
    val chunks = maxHamming + 1
    val width = 64 / chunks
    val withSig = df.select(col(keyCol), simhash(col(textCol)).as("simhash"))
    val chunked = withSig.select(col(keyCol), col("simhash"),
      posexplode(transform(sequence(lit(0), lit(chunks - 1)),
        i => call_function("shiftright", col("simhash"), i * lit(width))
          .bitwiseAND(lit((1L << width) - 1)))).as(Seq("chunk_i", "chunk_v")))
    val buckets = chunked.groupBy(col("chunk_i"), col("chunk_v"))
      .agg(array_sort(collect_list(
        struct(col(keyCol).as("k"), col("simhash").as("sig")))).as("ms"))
    bucketPairs(buckets, maxBucketSize)
      .select(
        least(col("p.a.k"), col("p.b.k")).as("key_a"),
        greatest(col("p.a.k"), col("p.b.k")).as("key_b"),
        bit_count(col("p.a.sig").bitwiseXOR(col("p.b.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** SimHash dedup with exact-dup pre-collapse: pigeonhole candidate pairs
    * among distinct-text representatives (EXACT — every pair within
    * `maxHamming` shares at least one of maxHamming+1 chunks), plus link
    * rows (hamming 0) for collapsed exact duplicates. Same dup-graph
    * output contract as [[minhashLshDedup]].
    */
  def simhashDedup(df: DataFrame, keyCol: String, textCol: String,
                   maxHamming: Int = 3,
                   maxBucketSize: Int = 1000): DataFrame = {
    // same materialization point as minhashLshDedup: reps feeds both the
    // pigeonhole pair stage and the link join
    val (reps0, links) = collapseExact(df, keyCol, textCol)
    val reps = persistTracked(reps0)
    simhashPairs(reps, keyCol, textCol, maxHamming, maxBucketSize)
      .unionByName(links.withColumn("hamming", lit(0)))
  }

  /** Exact n-gram Jaccard near-dup pairs via an inverted-index join.
    * `maxDocFreq` drops shingles present in more than that many documents
    * (they contribute little discrimination and all the join skew).
    */
  def ngramJaccardPairs(df: DataFrame, keyCol: String, textCol: String,
                        n: Int = 3, threshold: Double = 0.5,
                        maxDocFreq: Int = 1000): DataFrame = {
    val docs = df.select(col(keyCol),
      shingles(col(textCol), n).as("shs"))
      .withColumn("n_sh", size(col("shs")))
    val inv = docs.select(col(keyCol), col("n_sh"),
      explode(col("shs")).as("sh"))
    val dfreq = inv.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocFreq)
    val pruned = inv.join(dfreq.select("sh"), Seq("sh"))
    val l = pruned.select(col("sh"), col(keyCol).as("key_a"), col("n_sh").as("na"))
    val r = pruned.select(col("sh"), col(keyCol).as("key_b"), col("n_sh").as("nb"))
    l.join(r, Seq("sh"))
      .filter(col("key_a") < col("key_b"))
      .groupBy(col("key_a"), col("key_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", col("inter").cast(DoubleType) /
        (col("na") + col("nb") - col("inter")).cast(DoubleType))
      .filter(col("jaccard") >= threshold)
      .select("key_a", "key_b", "jaccard")
  }

  /** Embedding near-dup pairs: cosine >= threshold via the Similarity
    * module's LSH buckets (see Similarity.cosinePairs).
    */
  def embeddingPairs(df: DataFrame, keyCol: String, vecCol: String,
                     threshold: Double = 0.95): DataFrame =
    Similarity.cosinePairs(df, keyCol, vecCol, threshold)

  /** Connected components over a dup-graph edge list: (node, cluster_id)
    * with cluster_id = the minimum key reachable from the node. This is
    * the step that turns the pair outputs above into dedup DECISIONS
    * (keep cluster_id == node, drop the rest).
    *
    * Hash-min label propagation: each round every node takes the min of
    * its own label and its neighbors' labels (one shuffle per round),
    * stopping when a round changes nothing. Plain hash-min converges in
    * O(graph diameter) rounds — usually the wrong algorithm for general
    * graphs at scale (large-star/small-star halves that), but exactly the
    * right one for THIS graph: [[collapseExact]] emits hub-and-spoke link
    * rows and LSH pairs connect representatives directly, so dup-cluster
    * diameter is small and bounded by construction (star expansion keeps
    * even over-cap buckets at diameter <= 4). Each round is
    * localCheckpoint-truncated: every round's plan references the
    * previous round's twice, so without truncation the LOGICAL plan
    * doubles per iteration (a driver-side exponential that has nothing
    * to do with data volume); checkpointed blocks are released by the
    * ContextCleaner as rounds go out of scope. For graphs whose diameter
    * is NOT bounded (long near-dup chains), use
    * [[connectedComponentsStar]] — O(log^2 n) rounds regardless.
    */

  /** EXACT SUBSTRING dedup (the Lee et al. 2022 "Deduplicating Training
    * Data Makes Language Models Better" modality, re-expressed for
    * Spark): remove every span of `windowTokens` consecutive words that
    * also appears verbatim in ANOTHER document, and rebuild each document
    * from its surviving tokens. Doc-level dedup (exact/minhash/simhash)
    * keeps one copy of a duplicated PAGE; this removes duplicated
    * PASSAGES — licence blocks, quoted boilerplate, syndicated paragraphs
    * — that survive doc-level dedup inside otherwise-unique pages.
    *
    * Semantics (oracle-twinned, frozen):
    *  - tokens = \s+-split non-empty words ([[graft.functions.Heuristics.words]]
    *    twin); documents with fewer than `windowTokens` tokens are
    *    untouched;
    *  - a window (start s, the W tokens s..s+W-1 joined by ' ') is
    *    duplicated iff its md5 appears in >= 2 DISTINCT documents
    *    (within-doc repetition is the repetition rule's job, not this
    *    operator's);
    *  - every token covered by any duplicated window occurrence is
    *    removed; `clean_text` is the surviving tokens joined by single
    *    spaces (token-stream rebuild — whitespace is canonicalized,
    *    exactly like a suffix-array pass over a tokenized corpus).
    *
    * The reference corpus-dedup literature builds one suffix array over
    * the concatenated corpus — inherently single-machine. The Spark
    * re-expression shuffles only: (key, md5(window)) pairs for the
    * doc-frequency pass; duplicated occurrences exploded xW for span
    * coverage (bounded by dup volume, not corpus volume); and the one
    * text-carrying reassembly shuffle of surviving tokens (same shape as
    * [[Curation.dedupLines]]). The window hasher is a JVM sliding-window
    * UDF for the same measured reason as [[shingles]]: the Catalyst
    * transform-over-sequence+slice formulation copies the word array per
    * window, O(words^2) per document.
    */
  private val HexDigits = "0123456789abcdef".toCharArray

  def substringDedup(docs: DataFrame, keyCol: String, textCol: String,
                     windowTokens: Int = 15): DataFrame = {
    val W = windowTokens
    require(W >= 2, "windowTokens must be >= 2")
    val winHashes = udf { ws: Seq[String] =>
      if (ws == null || ws.length < W) Seq.empty[String]
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val arr = ws.toArray
        val sb = new StringBuilder
        (0 to arr.length - W).map { s =>
          sb.setLength(0)
          var j = 0
          while (j < W) {
            if (j > 0) sb.append(' ')
            sb.append(arr(s + j))
            j += 1
          }
          md.reset()
          val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val hex = new Array[Char](32)
          var k = 0
          while (k < 16) {
            val v = d(k) & 0xff
            hex(2 * k) = HexDigits(v >> 4); hex(2 * k + 1) = HexDigits(v & 15)
            k += 1
          }
          new String(hex)
        }
      }
    }
    val base = docs.select(col(keyCol),
      graft.functions.Heuristics.words(col(textCol)).as("w"))
    val wins = base.select(col(keyCol),
      posexplode(winHashes(col("w"))).as(Seq("s", "h")))
    val dup = wins.select(col(keyCol), col("h")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2).select(col("h"))
    // covered token positions of duplicated occurrences: the xW explode
    // is bounded by the volume of DUPLICATED text, not the corpus
    val covered = wins.join(dup, Seq("h"))
      .select(col(keyCol),
        explode(sequence(col("s"), col("s") + lit(W - 1))).as("p"))
      .distinct()
    val toks = base.select(col(keyCol),
      posexplode(col("w")).as(Seq("p", "word")))
    val kept = toks.join(covered, Seq(keyCol, "p"), "left_anti")
    val rebuilt = kept.groupBy(col(keyCol)).agg(
      array_join(transform(
        array_sort(collect_list(struct(col("p"), col("word")))),
        x => x("word")), " ").as("clean_text"),
      count(lit(1)).as("kept_tokens"))
    base.select(col(keyCol), size(col("w")).cast(LongType).as("n_tokens"))
      .join(rebuilt, Seq(keyCol), "left")
      .select(col(keyCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("kept_tokens"), lit(0L)))
          .as("removed_tokens"))
  }

  /** `strict = true` (the library default) aborts if the labels have not
    * converged after `maxIter` rounds — right when the input is a
    * dup-graph built by the operators above, whose diameter IS bounded by
    * construction. Callers feeding a graph whose diameter is NOT bounded
    * (chained near-dup pairs A~B~C~... each above threshold without A~C —
    * e.g. serially-edited templated pages — give O(chain) diameter) should
    * raise `maxIter` and/or pass `strict = false`, which logs and returns
    * the best-effort labels instead of failing the whole job. Both knobs
    * are plumbed through [[dedupDecisions]] and the `graft.Main dedup`
    * subcommand.
    */
  def connectedComponents(pairs: DataFrame, keyA: String = "key_a",
                          keyB: String = "key_b",
                          maxIter: Int = 20,
                          strict: Boolean = true): DataFrame = {
    val edges = pairs.select(col(keyA).as("a"), col(keyB).as("b"))
      .unionByName(pairs.select(col(keyB).as("a"), col(keyA).as("b")))
      .distinct()
      .persist()
    // localCheckpoint per round, NOT persist: each round's plan references
    // the previous round's TWICE (the union arm and the neighbor join), so
    // without truncation the logical plan doubles per iteration — fine for
    // the 3-5 rounds a bounded-diameter dup-graph needs, an exponential
    // driver-side blowup by round ~12 (seen as an OOM analyzing round 12
    // on a 200-hop chain). Checkpointing materializes the round and cuts
    // the plan to a leaf; blocks are released by the ContextCleaner as
    // rounds go out of scope. (On a cluster, reliable checkpointing would
    // be the restart-safe variant of the same move.)
    var labels = edges.select(col("a").as("node"))
      .distinct()
      .withColumn("cluster_id", col("node"))
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // candidate labels: own label + min over neighbor labels
      val viaNeighbor = edges
        .join(labels.withColumnRenamed("node", "b"), Seq("b"))
        .select(col("a").as("node"), col("cluster_id"))
      // round-7: each node's PREVIOUS label rides through the aggregate
      // (it is the single non-null __old per node, so max() recovers it),
      // making the convergence check a narrow filter over the
      // checkpointed round — the old formulation paid a second shuffle
      // join (next ⋈ labels) per round just to ask "did anything move"
      val next = labels
        .select(col("node"), col("cluster_id"),
          col("cluster_id").as("__old"))
        .unionByName(viaNeighbor.withColumn("__old",
          lit(null).cast(labels.schema("cluster_id").dataType)))
        .groupBy(col("node"))
        .agg(min(col("cluster_id")).as("cluster_id"),
          max(col("__old")).as("__old"))
        .localCheckpoint(true)
      val changed = next.filter(col("cluster_id") =!= col("__old"))
        .limit(1).count()
      labels = next.drop("__old")
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    if (!converged) {
      if (strict)
        throw new IllegalStateException(
          s"connectedComponents did not converge in $maxIter rounds — " +
            "graph diameter exceeds the dup-graph construction bound; " +
            "raise maxIter or pass strict = false for best-effort labels")
      else
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"connectedComponents did not converge in $maxIter rounds; " +
            "returning best-effort labels (some clusters may be split)")
    }
    // the final labels are localCheckpoint-materialized; their blocks are
    // released by the ContextCleaner once the caller drops the reference
    labels
  }

  /** Connected components via alternating LARGE-STAR / SMALL-STAR rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    * the algorithm for dup-graphs whose diameter is NOT bounded by
    * construction. Hash-min ([[connectedComponents]]) converges in
    * O(diameter) rounds, which is right for the hub-and-spoke graphs the
    * collapse/LSH operators emit but degrades to O(chain length) on
    * chained near-dup pairs (serially-edited templated pages: A~B, B~C,
    * ... each above threshold without A~C). Star contraction converges in
    * O(log^2 n) rounds REGARDLESS of diameter:
    *
    *   large-star(u): every neighbor v > u re-attaches to
    *                  m(u) = min(N(u) ∪ {u});
    *   small-star(u): every neighbor v <= u re-attaches to m(u).
    *
    * Each round is two shuffles (a per-node min aggregation + a join
    * back); per-round state is persisted and the previous round released,
    * so lineage stays bounded like the hash-min loop. Returns the same
    * (node, cluster_id = component minimum) contract.
    */
  def connectedComponentsStar(pairs: DataFrame, keyA: String = "key_a",
                              keyB: String = "key_b",
                              maxIter: Int = 50): DataFrame = {
    def canon(e: DataFrame): DataFrame =
      e.filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
        .distinct()
    // one star phase: per node u over the BIDIRECTED neighbor list,
    // m(u) = min(neighbors, u); re-attach the selected neighbors to m(u)
    def phase(e: DataFrame, large: Boolean): DataFrame = {
      val nbr = e.select(col("a").as("u"), col("b").as("v"))
        .unionByName(e.select(col("b").as("u"), col("a").as("v")))
      val m = nbr.groupBy(col("u"))
        .agg(least(min(col("v")), col("u")).as("m"))
      val selected =
        if (large) nbr.filter(col("v") > col("u"))
        else nbr.filter(col("v") <= col("u"))
      canon(selected.join(m, Seq("u"))
        .select(col("v").as("a"), col("m").as("b"))
        .unionByName(m.select(col("u").as("a"), col("m").as("b"))))
    }
    // localCheckpoint per round (same reason as the hash-min loop): each
    // phase references its input plan twice (neighbor list + min join),
    // so un-truncated plans grow 4x per round
    var edges = canon(
      pairs.select(col(keyA).as("a"), col(keyB).as("b"))).localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val next = phase(phase(edges, large = true), large = false)
        .localCheckpoint(true)
      // fixed point: both phases leave the edge set unchanged — compare
      // via an anti-join in each direction (cheap: edge sets shrink fast)
      val changed =
        next.join(edges, Seq("a", "b"), "left_anti").limit(1).count() +
          edges.join(next, Seq("a", "b"), "left_anti").limit(1).count()
      edges = next
      converged = changed == 0
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge in $maxIter rounds " +
          "(expected O(log^2 n) — raise maxIter)")
    // at the fixed point every component is a star centered at its
    // minimum; canon ordered each edge (a = center = min, b = member)
    val labels = edges.select(col("b").as("node"), col("a").as("cluster_id"))
      .unionByName(edges.select(col("a").as("node"), col("a").as("cluster_id")))
      .groupBy(col("node")).agg(min(col("cluster_id")).as("cluster_id"))
    labels
  }

  /** Full dedup decision: every document labeled with its dup-cluster id
    * and a keep flag (the cluster's minimum key survives). Documents in
    * no pair are their own singleton cluster.
    */
  /** `algorithm`: "hashmin" (default — O(diameter) rounds, right for the
    * diameter-bounded graphs the collapse/LSH operators emit) or "star"
    * (large-star/small-star, O(log^2 n) rounds for graphs with long
    * near-dup chains; `strict` does not apply — star always either
    * converges or throws).
    */
  def dedupDecisions(df: DataFrame, pairs: DataFrame, keyCol: String,
                     maxIter: Int = 20, strict: Boolean = true,
                     algorithm: String = "hashmin"): DataFrame = {
    val cc = algorithm match {
      case "hashmin" =>
        connectedComponents(pairs, maxIter = maxIter, strict = strict)
      case "star" => connectedComponentsStar(pairs, maxIter = maxIter)
      case other => throw new IllegalArgumentException(
        s"unknown components algorithm '$other' (expected hashmin|star)")
    }
    df.select(col(keyCol))
      .join(cc.withColumnRenamed("node", keyCol), Seq(keyCol), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col(keyCol)))
      .withColumn("keep", col("cluster_id") === col(keyCol))
  }
}
