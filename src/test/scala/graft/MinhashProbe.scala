package graft

import org.apache.spark.sql.functions._

/** Stage-level timing probe for dedup_minhash_lsh at sf0.1 — attributes
  * the headline time to collapse / candidates / verify / links.
  */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .repartition(32)
    def time(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"PROBE $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s  rows=$n")
    }
    // warm
    graft.operators.Dedup.minhashLshDedup(df, "doc_id", "text",
      jaccardThreshold = 0.5, maxBucketSize = 600).write
      .format("noop").mode("overwrite").save()
    (1 to 2).foreach { r =>
      time(s"full dedup (run $r)") {
        val d = graft.operators.Dedup.minhashLshDedup(df, "doc_id", "text",
          jaccardThreshold = 0.5, maxBucketSize = 600)
        d.write.format("noop").mode("overwrite").save(); 0L
      }
    }
    val (reps, links) = graft.operators.Dedup.collapseExact(df, "doc_id", "text")
    time("collapseExact reps count") { reps.count() }
    time("collapseExact reps again") { reps.count() }
    time("links count") { links.count() }
    time("signatures") {
      graft.operators.Dedup.minhashSignatures(reps, "doc_id", "text")
        .write.format("noop").mode("overwrite").save(); 0L
    }
    time("pairs (cand gen only)") {
      graft.operators.Dedup.minhashLshPairs(reps, "doc_id", "text",
        jaccardThreshold = 0.0, maxBucketSize = 600).count()
    }
    spark.stop()
  }
}
