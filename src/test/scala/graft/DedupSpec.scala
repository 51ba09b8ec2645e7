package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity}

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and then " +
    "runs far away into the deep green forest to find some food for winter"
  private lazy val docs = Seq(
    (0L, base),
    (1L, base),                                  // exact dup of 0
    (2L, base.replace("winter", "summer")),      // near dup of 0
    (3L, "completely different text about spark catalyst optimizer rules " +
      "and whole stage code generation for columnar execution engines"),
    (4L, "short doc"),
    (5L, "")
  ).toDF("doc_id", "text")

  test("exact dedup finds byte-identical groups, keeps lowest key") {
    val r = Dedup.exact(docs, "text", "doc_id")
      .select("doc_id", "is_dup").collect()
      .map(x => x.getLong(0) -> x.getBoolean(1)).toMap
    assert(r == Map(0L -> false, 1L -> true, 2L -> false, 3L -> false,
      4L -> false, 5L -> false))
  }

  test("minhash LSH finds exact + near dup pairs, not distinct docs") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      jaccardThreshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("minhash estimate ~1.0 for identical docs") {
    val est = Dedup.minhashLshPairs(docs, "doc_id", "text",
      jaccardThreshold = 0.5).filter(col("key_a") === 0 && col("key_b") === 1)
      .head().getAs[Double]("est_jaccard")
    assert(est == 1.0)
  }

  test("simhash: identical => distance 0; near dup small; distinct large") {
    val sigs = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(0L) == sigs(1L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(0L), sigs(2L)) <= 8)
    assert(ham(sigs(0L), sigs(3L)) > 8)
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("over-cap identical spam cluster is NOT silently dropped") {
    // 50 extra exact copies of doc 0: with maxBucketSize=5 the old code
    // silently emitted ZERO pairs for the hottest cluster — exactly the
    // spam dedup exists to catch
    val spam = (0L until 50L).map(i => (100L + i, base)).toDF("doc_id", "text")
    val mixed = docs.unionByName(spam)
    val out = Dedup.minhashLshDedup(mixed, "doc_id", "text",
      jaccardThreshold = 0.5, maxBucketSize = 5).collect()
    val byPair = out.map(r =>
      (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard")).toMap
    // every spam member links to the cluster representative (doc 0)
    (100L until 150L).foreach(k => assert(byPair((0L, k)) == 1.0,
      s"member $k missing from dup graph"))
    assert(byPair((0L, 1L)) == 1.0)             // original exact dup
    assert(byPair.contains((0L, 2L)))           // near dup survives collapse
    assert(byPair((0L, 2L)) > 0.8 && byPair((0L, 2L)) < 1.0) // EXACT jaccard
    assert(!byPair.keys.exists { case (a, b) => a == 3L || b == 3L })
    // link rows are O(cluster), not O(cluster^2)
    assert(out.length < 60)
  }

  test("simhash dedup: pre-collapse links + exact pigeonhole pairs") {
    val spam = (0L until 20L).map(i => (100L + i, base)).toDF("doc_id", "text")
    val mixed = docs.unionByName(spam)
    val out = Dedup.simhashDedup(mixed, "doc_id", "text", maxHamming = 8,
      maxBucketSize = 5).collect()
    val byPair = out.map(r =>
      (r.getLong(0), r.getLong(1)) -> r.getAs[Int]("hamming")).toMap
    (100L until 120L).foreach(k => assert(byPair((0L, k)) == 0))
    assert(byPair((0L, 1L)) == 0)
    assert(byPair.contains((0L, 2L)) && byPair((0L, 2L)) <= 8)
    assert(!byPair.keys.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("lshBucketSizes reports over-cap buckets (cap observability)") {
    val spam = (0L until 12L).map(i => (i, base)).toDF("doc_id", "text")
    val sizes = Dedup.lshBucketSizes(spam, "doc_id", "text",
      maxBucketSize = 4).collect()
    // 12 identical docs share every band bucket: all buckets size 12,
    // all flagged star_expanded — the drop/degrade is visible, not silent
    assert(sizes.nonEmpty)
    assert(sizes.forall(_.getAs[Long]("size") == 12L))
    assert(sizes.forall(_.getAs[Boolean]("star_expanded")))
  }

  test("star expansion keeps over-cap buckets connected in raw pairs API") {
    // identical docs, no pre-collapse, tiny cap: star links survive
    val spam = (0L until 12L).map(i => (i, base)).toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(spam, "doc_id", "text",
      jaccardThreshold = 0.5, maxBucketSize = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (1L until 12L).foreach(k => assert(pairs.contains((0L, k))))
  }

  test("ngram jaccard inverted-index pairs match brute-force jaccard") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.5).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Double]("jaccard"))).toMap
    assert(pairs(((0L, 1L))) == 1.0)
    assert(pairs.contains((0L, 2L)) && pairs((0L, 2L)) > 0.8)
    assert(!pairs.keys.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("borderline-jaccard pair: Spark output is CONTAINED in the exact " +
    "brute-force graph with exact jaccard values (the corpus-margin " +
    "assumption, regression-tested)") {
    // The driver-gate equality for dedup_minhash_lsh rests on the corpus
    // having no near-threshold pairs (SparkEntry corpus-margin note). This
    // test builds a corpus WITH a deliberate borderline pair and asserts
    // what LSH actually guarantees there: Spark ⊆ brute-force oracle, and
    // every emitted jaccard is the exact shingle jaccard — NOT equality
    // of the pair sets (16 bands x 4 rows misses a pair at jaccard ~0.55
    // with probability ~0.27 by design).
    val words = ('a' to 'z').map(_.toString)
    val a = words.take(20).mkString(" ")                    // shingles a..r (18)
    val b = (words.take(13) ++ words.drop(40)).mkString(" ") // shares 11 of them
    val corpus = Seq((0L, a), (1L, b), (2L, a), // 2 = exact dup of 0
      (3L, "unrelated text about catalyst optimizer rules entirely"))
      .toDF("doc_id", "text")
    val threshold = 0.5
    // exact brute-force dup graph with the same collapse semantics:
    // reps = min-key per distinct text, links at 1.0, all rep pairs with
    // exact shingle jaccard >= threshold
    def shingleSet(t: String): Set[String] =
      t.split("\\s+").filter(_.nonEmpty).sliding(3).map(_.mkString(" ")).toSet
    val texts = Map(0L -> a, 1L -> b, 3L ->
      "unrelated text about catalyst optimizer rules entirely")
    val repPairs = for {
      x <- texts.keys; y <- texts.keys if x < y
      sa = shingleSet(texts(x)); sb = shingleSet(texts(y))
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j >= threshold
    } yield ((x, y), j)
    val oracle = repPairs.toMap + (((0L, 2L), 1.0))
    // the pair (0,1) IS borderline: just above threshold, far below 0.9
    val j01 = oracle((0L, 1L))
    assert(j01 >= threshold && j01 < 0.7, s"fixture drifted: j(0,1)=$j01")
    val got = Dedup.minhashLshDedup(corpus, "doc_id", "text",
      jaccardThreshold = threshold).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard"))
      .toMap
    // containment: every emitted pair is a true pair with the EXACT value
    got.foreach { case (k, j) =>
      assert(oracle.contains(k), s"false positive $k")
      assert(math.abs(oracle(k) - j) < 1e-12, s"inexact jaccard at $k")
    }
    // the non-borderline edges can never be missed
    assert(got.contains((0L, 2L)))
    assert(!got.keys.exists { case (x, y) => x == 3L || y == 3L })
  }

  test("substring dedup: cross-doc passages removed, within-doc repeats " +
    "and short docs untouched") {
    val passage = (1 to 15).map(i => s"p$i").mkString(" ")
    val repeatQ = (1 to 15).map(i => s"q$i").mkString(" ")
    val docs = Seq(
      (0L, s"uniqueA1 uniqueA2 $passage uniqueA3"),
      (1L, s"uniqueB $passage"),
      (2L, "short doc"),                  // < 15 tokens: untouched
      (3L, s"$repeatQ $repeatQ")          // same-doc repeat: NOT duplicated
    ).toDF("doc_id", "text")
    val r = Dedup.substringDedup(docs, "doc_id", "text", windowTokens = 15)
      .collect().map(x => x.getLong(0) ->
        (x.getString(1), x.getLong(2), x.getLong(3))).toMap
    assert(r(0L) == ("uniqueA1 uniqueA2 uniqueA3", 18L, 15L))
    assert(r(1L) == ("uniqueB", 16L, 15L))
    assert(r(2L) == ("short doc", 2L, 0L))
    assert(r(3L) == (s"$repeatQ $repeatQ", 30L, 0L))
  }

  test("substring dedup: overlapping duplicated windows merge their spans") {
    // docs 0 and 1 share a 16-token passage -> two overlapping duplicated
    // 15-windows in each; the union covers all 16 tokens exactly once
    val passage = (1 to 16).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (0L, s"left $passage"),
      (1L, s"$passage right")).toDF("doc_id", "text")
    val r = Dedup.substringDedup(docs, "doc_id", "text", windowTokens = 15)
      .collect().map(x => x.getLong(0) -> (x.getString(1), x.getLong(3)))
      .toMap
    assert(r(0L) == ("left", 16L))
    assert(r(1L) == ("right", 16L))
  }

  test("resumable dedup DAG: kill between stages, restart skips committed " +
    "stages and yields identical decisions") {
    val realDocs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val stages = java.nio.file.Files.createTempDirectory("ddstages").toString
    // crash after 2 stage commits (reps, links committed; cand+ dies)
    val killed = intercept[RuntimeException] {
      Dedup.dedupResumable(realDocs, "doc_id", "text", stages,
        jaccardThreshold = 0.5, failAfter = 2)
    }
    assert(killed.getMessage.contains("injected failure before stage cand"))
    assert(new java.io.File(s"$stages/reps/_SUCCESS").exists())
    assert(new java.io.File(s"$stages/links/_SUCCESS").exists())
    assert(!new java.io.File(s"$stages/cand/_SUCCESS").exists())
    val repsMtime = new java.io.File(s"$stages/reps/_SUCCESS").lastModified()
    val linksMtime = new java.io.File(s"$stages/links/_SUCCESS").lastModified()
    // restart: completed stages restored from storage, not recomputed
    val (resumed, report) = Dedup.dedupResumable(realDocs, "doc_id", "text",
      stages, jaccardThreshold = 0.5)
    assert(report.skipped == Seq("reps", "links"))
    assert(report.ran == Seq("cand", "pairs", "decisions"))
    assert(new java.io.File(s"$stages/reps/_SUCCESS").lastModified() == repsMtime)
    assert(new java.io.File(s"$stages/links/_SUCCESS").lastModified() == linksMtime)
    // identical decisions to the single-shot (non-resumable) pipeline
    val oneShot = Dedup.dedupDecisions(realDocs,
      Dedup.minhashLshDedup(realDocs, "doc_id", "text",
        jaccardThreshold = 0.5).select("key_a", "key_b"), "doc_id")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "cluster_id", "keep")
        .collect().map(_.toString).sorted.toSeq
    assert(canon(resumed) == canon(oneShot))
    assert(resumed.filter(!col("keep")).count() > 0, "fixture has dup clusters")
    // a fully-committed DAG restarts as all-skip (pure read)
    val (_, again) = Dedup.dedupResumable(realDocs, "doc_id", "text", stages,
      jaccardThreshold = 0.5)
    assert(again.ran.isEmpty && again.skipped.size == 5)
    // parameter guard: resuming the same committed dir under a DIFFERENT
    // policy fails loudly by name instead of silently reusing stages
    // (threshold change, and an inputTag change — the pipeline's
    // classifier-gate threshold rides in through inputTag)
    val drifted = intercept[IllegalArgumentException] {
      Dedup.dedupResumable(realDocs, "doc_id", "text", stages,
        jaccardThreshold = 0.8)
    }
    assert(drifted.getMessage.contains("different parameters") &&
      drifted.getMessage.contains("jaccardThreshold=0.8"))
    val tagged = intercept[IllegalArgumentException] {
      Dedup.dedupResumable(realDocs, "doc_id", "text", stages,
        jaccardThreshold = 0.5, inputTag = "minQualityProb=0.5")
    }
    assert(tagged.getMessage.contains("inputTag=minQualityProb=0.5"))
  }

  test("incremental dedup: corpus priority via exact + near cross links, " +
    "bridge components drop wholesale, empty corpus == batch decisions") {
    val corpus = Seq(
      (100L, base),
      (101L, "corpus only unique text about databases and storage engines " +
        "operating reliably at very large scale"),
      (102L, "")
    ).toDF("doc_id", "text")
    // bridge construction: mid is near the corpus doc, far is near mid but
    // NOT near the corpus doc — the fixture proves its own premise with an
    // independent shingle-jaccard computation
    val bridgeMid = base.replace("quick", "swift")
    val bridgeFar = bridgeMid.replace("deep", "dark").replace("food", "nuts")
    def shs(t: String): Set[String] = t.split("\\s+").filter(_.nonEmpty)
      .sliding(3).map(_.mkString(" ")).toSet
    def jac(a: String, b: String): Double = {
      val (x, y) = (shs(a), shs(b))
      (x & y).size.toDouble / (x | y).size
    }
    assert(jac(bridgeMid, base) >= 0.5 && jac(bridgeFar, bridgeMid) >= 0.5 &&
      jac(bridgeFar, base) < 0.5)
    val freshUnique = "fresh snapshot document with entirely new content " +
      "about streaming state stores and watermark semantics for late " +
      "arriving events in long running sessions"
    val fresh = Seq(
      (200L, base),                                 // byte-equal to corpus 100
      (201L, base.replace("winter", "summer")),     // near corpus 100
      (202L, freshUnique),                          // kept fresh head
      (203L, freshUnique),                          // fresh-internal exact dup
      (204L, freshUnique.replace("late", "early")), // fresh-internal near dup
      (205L, ""),                                   // fingerprint link to 102
      (206L, "totally standalone fresh document"),  // kept
      (207L, bridgeMid),
      (208L, bridgeFar)                             // drops ONLY via the bridge
    ).toDF("doc_id", "text")
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    val got = asMap(Dedup.dedupIncremental(corpus, fresh, "doc_id", "text",
      jaccardThreshold = 0.5))
    assert(got == Map(
      200L -> (false, Some(100L)), 201L -> (false, Some(100L)),
      202L -> (true, None), 203L -> (false, Some(202L)),
      204L -> (false, Some(202L)), 205L -> (false, Some(102L)),
      206L -> (true, None),
      // 200/201/207/208 are ONE fresh component (successive single-word
      // mutations chain at >= 0.5) linked to corpus 100 -> all resolve
      // there, including 208, which has no direct corpus link
      207L -> (false, Some(100L)), 208L -> (false, Some(100L))))
    // the Bloom prefilter is an optimization, never a semantics change:
    // decisions with it disabled are identical (false positives only
    // re-admit corpus rows the exact joins discard anyway)
    val noBloom = asMap(Dedup.dedupIncremental(corpus, fresh,
      "doc_id", "text", jaccardThreshold = 0.5, bloomFpp = -1.0))
    assert(noBloom == got)
    // empty corpus degenerates to exactly the batch pipeline's decisions
    val inc0 = asMap(Dedup.dedupIncremental(corpus.limit(0), fresh,
      "doc_id", "text", jaccardThreshold = 0.5))
    val batch = Dedup.dedupDecisions(fresh,
      Dedup.minhashLshDedup(fresh, "doc_id", "text", jaccardThreshold = 0.5)
        .select("key_a", "key_b"), "doc_id")
      .collect().map { r =>
        val (id, cluster, keep) =
          (r.getLong(0), r.getLong(1), r.getBoolean(2))
        id -> (keep, if (keep) None else Some(cluster))
      }.toMap
    assert(inc0 == batch)
    Dedup.releaseCaches()
  }

  test("connected components: chain convergence, singletons, min-key labels") {
    // chain 1-2-3-4 (diameter 3 — forces multiple hash-min rounds),
    // a separate pair {10,11}, and isolated docs 5/6
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L))
      .toDF("key_a", "key_b")
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L, 10L, 11L).toDF("doc_id")
    val expect = Map(
      1L -> ((1L, true)), 2L -> ((1L, false)), 3L -> ((1L, false)),
      4L -> ((1L, false)), 5L -> ((5L, true)), 6L -> ((6L, true)),
      10L -> ((10L, true)), 11L -> ((10L, false)))
    val out = graft.operators.Dedup.dedupDecisions(docs, pairs, "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(out == expect)
    // the star algorithm produces identical decisions through dedupDecisions
    val outStar = graft.operators.Dedup.dedupDecisions(docs, pairs, "doc_id",
        algorithm = "star")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(outStar == expect)
  }

  test("connected components match union-find on random graphs (property)") {
    val rnd = new scala.util.Random(20260816L)
    (1 to 5).foreach { _ =>
      val n = 4 + rnd.nextInt(12)
      val edges = Seq.fill(4 + rnd.nextInt(16))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2).distinct
      if (edges.nonEmpty) {
        // union-find reference
        val parent = Array.tabulate(n)(identity)
        def find(x: Int): Int = {
          var r = x; while (parent(r) != r) r = parent(r); r
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a.toInt), find(b.toInt))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val present = edges.flatMap(e => Seq(e._1.toInt, e._2.toInt)).distinct
        val minOf = present.groupBy(find).map { case (r, xs) => r -> xs.min }
        val expected = present.map(x => x.toLong -> minOf(find(x)).toLong).toMap
        val got = graft.operators.Dedup.connectedComponents(
            edges.toDF("key_a", "key_b"), maxIter = 64)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == expected, s"edges=$edges")
      }
    }
  }

  test("large-star/small-star components match union-find on random " +
    "graphs and converge on a long chain where hash-min cannot") {
    val rnd = new scala.util.Random(20260817L)
    def unionFindLabels(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = {
        var r = x; while (parent(r) != r) r = parent(r); r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val present = edges.flatMap(e => Seq(e._1.toInt, e._2.toInt)).distinct
      val minOf = present.groupBy(find).map { case (r, xs) => r -> xs.min }
      present.map(x => x.toLong -> minOf(find(x)).toLong).toMap
    }
    (1 to 4).foreach { _ =>
      val n = 4 + rnd.nextInt(12)
      val edges = Seq.fill(4 + rnd.nextInt(16))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2).distinct
      if (edges.nonEmpty) {
        val got = Dedup.connectedComponentsStar(edges.toDF("key_a", "key_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == unionFindLabels(n, edges), s"edges=$edges")
      }
    }
    // one larger graph (200 nodes, ~300 edges, mixed components) against
    // union-find — the small graphs above can miss multi-round collapse
    // interactions
    val nBig = 200
    val bigEdges = Seq.fill(300)(
      (rnd.nextInt(nBig).toLong, rnd.nextInt(nBig).toLong))
      .filter(e => e._1 != e._2).distinct
    val gotBig = Dedup.connectedComponentsStar(bigEdges.toDF("key_a", "key_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotBig == unionFindLabels(nBig, bigEdges))

    // 200-hop chain (keys descending so min-propagation must cross the
    // whole chain): hash-min needs ~200 rounds — at maxIter=12 it must
    // refuse; star contraction converges within the same 12 and labels
    // every node with the chain minimum
    val chain = (0L until 200L).map(i => (i, i + 1))
    assertThrows[IllegalStateException] {
      Dedup.connectedComponents(chain.toDF("key_a", "key_b"), maxIter = 12)
    }
    val star = Dedup.connectedComponentsStar(chain.toDF("key_a", "key_b"),
      maxIter = 12).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star.size == 201 && star.values.forall(_ == 0L))
    // non-strict hash-min on the same budget returns best-effort labels
    // instead of aborting (the production long-chain escape hatch)
    val bestEffort = Dedup.connectedComponents(
      chain.toDF("key_a", "key_b"), maxIter = 12, strict = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bestEffort.size == 201)
  }

  test("embedding near-dup pairs via LSH + cosine") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.2f)),
      (1L, Seq(0.99f, 0.01f, 0.0f, 0.2f)),   // near dup of 0
      (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Seq(0.0f, 0.0f, 1.0f, 0.5f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingPairs(vecs, "vec_id", "embedding", 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("incremental dedup: hot corpus band bucket capped — fresh still " +
    "resolves to the minimum corpus key and the job stays linear") {
    import spark.implicits._
    val base = ("alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon ") * 3
    // 12 NON-identical near-dup corpus docs (distinct tails defeat exact
    // collapse) — they share almost every band bucket, so a small
    // maxBucketSize makes those buckets hot
    val corpus = (0L until 12L).map(i => (i, s"$base tail$i"))
      .toDF("doc_id", "text")
    val fresh = Seq((100L, s"$base tailx")).toDF("doc_id", "text")
    val got = Dedup.dedupIncremental(corpus, fresh, "doc_id", "text",
      jaccardThreshold = 0.5, maxBucketSize = 2)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
      .toSeq
    Dedup.releaseCaches()
    // the cap always retains each bucket's minimum corpus key, so the
    // resolved_to target is the same one the uncapped join would pick
    assert(got == Seq((100L, false, 0L)), s"got $got")
  }

  test("incremental dedup: precomputed corpus metadata path is " +
    "byte-identical to the recomputed path") {
    import spark.implicits._
    val corpus = (0L until 30L).map(i => (i, s"corpus doc number $i with " +
      "shared words about crawling and indexing the public web"))
      .toDF("doc_id", "text")
    val fresh = (100L until 120L).map(i => (i, s"fresh doc number $i " +
      "with shared words about crawling and indexing the public web"))
      .toDF("doc_id", "text")
      .unionByName(Seq((200L,
        "corpus doc number 3 with shared words about crawling and " +
          "indexing the public web")) // byte-equal to corpus doc 3
        .toDF("doc_id", "text"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val recomputed = canon(Dedup.dedupIncremental(corpus, fresh,
      "doc_id", "text", jaccardThreshold = 0.5))
    Dedup.releaseCaches()
    // commit the metadata to parquet (the production shape) and resume
    // through it
    val dir = java.nio.file.Files.createTempDirectory("cmeta").toString
    val (fps, bnds) = Dedup.corpusDedupMeta(corpus, "doc_id", "text")
    fps.write.mode("overwrite").parquet(s"$dir/fingerprints")
    bnds.write.mode("overwrite").parquet(s"$dir/bands")
    Dedup.releaseCaches()
    val precomputed = canon(Dedup.dedupIncremental(corpus, fresh,
      "doc_id", "text", jaccardThreshold = 0.5,
      corpusMeta = Some((spark.read.parquet(s"$dir/fingerprints"),
        spark.read.parquet(s"$dir/bands")))))
    Dedup.releaseCaches()
    assert(precomputed == recomputed)
  }
}

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val vecs = (0 until 50).map { i =>
    // deterministic unit-ish vectors on a ring
    val a = i * 0.12
    (i.toLong, Seq(math.cos(a).toFloat, math.sin(a).toFloat,
      (i % 7) * 0.1f, 0.5f))
  }.toDF("vec_id", "embedding")

  test("semantic dedup: planted near-identical vectors collapse to the " +
    "min key; mid-angle and lone vectors keep") {
    val planted = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(0.999f, 0.01f, 0.0f, 0.0f)), // near-dup of 0
      (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Seq(0.01f, 0.999f, 0.0f, 0.0f)), // near-dup of 2
      (4L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),    // alone in its direction
      (5L, Seq(0.7f, 0.7f, 0.0f, 0.0f))     // cos ~0.71 to 0 and 2: kept
    ).toDF("vec_id", "embedding")
    // k = 1: one cell, so this pins the THRESHOLD/component semantics
    // exactly (the cell partition itself is pinned by the dedup_semantic
    // gate oracle, which re-derives the md5 centroids in SQL)
    val got = Similarity.semanticDedup(planted, "vec_id", "embedding",
      k = 1, cosineThreshold = 0.95)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got == Map(
      0L -> ((0L, true)), 1L -> ((0L, false)),
      2L -> ((2L, true)), 3L -> ((2L, false)),
      4L -> ((4L, true)), 5L -> ((5L, true))))
  }

  test("incremental semantic dedup: corpus priority, component-wholesale " +
    "drops, empty corpus degenerates to the batch decisions") {
    val corpus = Seq(
      (100L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (101L, Seq(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val fresh = Seq(
      (200L, Seq(0.999f, 0.01f, 0.0f, 0.0f)),  // near corpus 100
      (201L, Seq(0.998f, 0.02f, 0.0f, 0.0f)),  // near 200 -> same component
      (202L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),     // unlinked head: kept
      (203L, Seq(0.0f, 0.01f, 0.999f, 0.0f)),  // near 202 -> dup_of 202
      (204L, Seq(0.0f, 0.0f, 0.0f, 1.0f))      // standalone: kept
    ).toDF("vec_id", "embedding")
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    val got = asMap(Similarity.semanticDedupIncremental(corpus, fresh,
      "vec_id", "embedding", k = 1, cosineThreshold = 0.95))
    assert(got == Map(
      200L -> ((false, Some(100L))), 201L -> ((false, Some(100L))),
      202L -> ((true, None)), 203L -> ((false, Some(202L))),
      204L -> ((true, None))))
    // empty corpus: fresh-derived centroids, decisions == the batch
    // operator's (keep equal; dup_of = cluster for dropped docs)
    val inc0 = asMap(Similarity.semanticDedupIncremental(corpus.limit(0),
      fresh, "vec_id", "embedding", k = 1, cosineThreshold = 0.95))
    val batch = Similarity.semanticDedup(fresh, "vec_id", "embedding",
      k = 1, cosineThreshold = 0.95).collect()
      .map { r =>
        val (id, cluster, keep) =
          (r.getLong(0), r.getLong(1), r.getBoolean(2))
        id -> ((keep, if (keep) None else Some(cluster)))
      }.toMap
    assert(inc0 == batch)
  }

  test("brute-force top-k: query's own vector ranks first with score 1") {
    val q = vecs.filter(col("vec_id") === 0).head().getSeq[Float](1)
      .map(_.toDouble)
    val top = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", q, 5)
      .collect()
    assert(top.head.getLong(0) == 0L)
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-9)
    // scores non-increasing
    val scores = top.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("LSH top-k returns a subset of brute-force ranking incl. the query") {
    val q = vecs.filter(col("vec_id") === 0).head().getSeq[Float](1)
      .map(_.toDouble)
    val lsh = Similarity.lshTopK(vecs, "vec_id", "embedding", q, 5, bits = 4)
      .collect()
    assert(lsh.nonEmpty)
    assert(lsh.head.getLong(0) == 0L) // own bucket contains the query vector
  }

  test("IVF top-k finds the query vector and ranks a brute-force subset") {
    val q = vecs.filter(col("vec_id") === 0).head().getSeq[Float](1)
      .map(_.toDouble)
    val brute = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    val ivf = Similarity.ivfTopK(vecs, "vec_id", "embedding", q, 10,
      k = 4, probes = 2).collect()
    assert(ivf.head.getLong(0) == 0L)
    // every IVF hit is a real neighbor per brute force ordering semantics:
    // scores must be correct cosines (spot check vs brute-force scores)
    val bruteScores = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      q, 50).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ivf.foreach(r =>
      assert(math.abs(bruteScores(r.getLong(0)) - r.getDouble(1)) < 1e-9))
    // recall sanity: probing half the cells finds most of the true top-10
    assert(ivf.map(_.getLong(0)).count(brute.contains) >= 5)
  }

  test("k-means-refined IVF: recall at least matches the sampled index") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") === 7)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val brute = Similarity.bruteForceTopK(e, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    def recall(iters: Int): Double = {
      val got = Similarity.ivfTopK(e, "vec_id", "embedding", q, 10,
        k = 8, probes = 2, trainIters = iters)
        .collect().map(_.getLong(0)).toSet
      brute.intersect(got).size / 10.0
    }
    val untrained = recall(0)
    val trained = recall(2)
    assert(trained >= untrained - 0.1,
      s"trained IVF recall $trained collapsed vs sampled $untrained")
    // trained scores are still exact cosines (spot check vs brute force)
    val bruteScores = Similarity.bruteForceTopK(e, "vec_id", "embedding",
      q, 200).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    Similarity.ivfTopK(e, "vec_id", "embedding", q, 10, k = 8, probes = 2,
      trainIters = 2).collect().foreach { r =>
      assert(math.abs(bruteScores(r.getLong(0)) - r.getDouble(1)) < 1e-9)
    }
  }

  test("LSH buckets are deterministic across evaluations") {
    val dims = vecs.select(size(col("embedding"))).head().getInt(0)
    val b1 = vecs.select(Similarity.lshBucket(col("embedding"), 6, dims)).collect()
    val b2 = vecs.select(Similarity.lshBucket(col("embedding"), 6, dims)).collect()
    assert(b1.map(_.getLong(0)).toSeq == b2.map(_.getLong(0)).toSeq)
  }

  test("multi-probe LSH recall beats single-bucket and reports honestly") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val brute = Similarity.bruteForceTopK(e, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    def recall(probes: Int): Double = {
      val got = Similarity.lshTopK(e, "vec_id", "embedding", q, 10,
        bits = 4, probes = probes).collect().map(_.getLong(0)).toSet
      brute.intersect(got).size / 10.0
    }
    val r0 = recall(0)
    val r2 = recall(2)
    assert(r2 >= r0, s"multi-probe recall $r2 < single-bucket $r0")
    // the query's own vector is always in its own bucket
    assert(Similarity.lshTopK(e, "vec_id", "embedding", q, 10, 4, 0)
      .collect().map(_.getLong(0)).contains(0L))
  }

  test("hot-cell cap: a skewed cell star-expands to O(n) hub links and a " +
    "tight near-identical cluster still collapses to the min key") {
    // 40 near-identical vectors: one dense region -> one hot cell (k = 1)
    val hot = (0L until 40L).map(i =>
      (i, Seq(1.0f, (i * 1e-4).toFloat, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val assigned = Similarity.assignCells(hot, "embedding",
      Similarity.sampleCentroids(hot, "vec_id", "embedding", 1))
    // over-cap: n-1 hub links, not n*(n-1)/2 pairs
    assert(Similarity.cellPairs(assigned, "vec_id", "embedding", 8)
      .count() == 39L)
    // under-cap: byte-identical full expansion
    assert(Similarity.cellPairs(assigned, "vec_id", "embedding", 10000)
      .count() == 40L * 39 / 2)
    // decisions under the cap: every member's cosine to the hub crosses
    // the threshold, so the whole cluster still resolves to the min key
    val got = Similarity.semanticDedup(hot, "vec_id", "embedding", k = 1,
      cosineThreshold = 0.95, maxCellSize = 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got.values.forall(_._1 == 0L), s"clusters split: $got")
    assert(got.count(_._2._2) == 1 && got(0L)._2)
  }

  test("incremental semantic dedup: precomputed centroids are " +
    "byte-identical to the per-run corpus sample") {
    val corpus = Seq(
      (100L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (101L, Seq(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val fresh = Seq(
      (200L, Seq(0.999f, 0.01f, 0.0f, 0.0f)),
      (201L, Seq(0.0f, 0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val recomputed = canon(Similarity.semanticDedupIncremental(corpus,
      fresh, "vec_id", "embedding", k = 2, cosineThreshold = 0.95))
    // commit-time centroids = the same deterministic sample
    val committed = Similarity.sampleCentroids(corpus, "vec_id",
      "embedding", 2)
    val precomputed = canon(Similarity.semanticDedupIncremental(corpus,
      fresh, "vec_id", "embedding", k = 2, cosineThreshold = 0.95,
      precomputedCentroids = Some(committed)))
    assert(precomputed == recomputed)
    // ivfTopK through committed centroids returns identical rows too
    val q = Seq(1.0, 0.0, 0.0, 0.0)
    val a = canon(Similarity.ivfTopK(corpus, "vec_id", "embedding", q, 2,
      k = 2, probes = 1))
    val b = canon(Similarity.ivfTopK(corpus, "vec_id", "embedding", q, 2,
      k = 2, probes = 1, precomputedCentroids = Some(committed)))
    assert(a == b)
  }

  test("hot-cell cap: decisions byte-identical when no cell exceeds it") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val a = Similarity.semanticDedup(vecs, "vec_id", "embedding",
      k = 4, cosineThreshold = 0.97)
    val b = Similarity.semanticDedup(vecs, "vec_id", "embedding",
      k = 4, cosineThreshold = 0.97, maxCellSize = 50)
    assert(canon(a) == canon(b))
  }
}
