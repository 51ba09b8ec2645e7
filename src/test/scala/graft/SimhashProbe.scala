package graft
import org.apache.spark.sql.functions._
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.ui.enabled","false")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.files.maxPartitionBytes", (1<<21).toString)
      .config("spark.sql.files.openCostInBytes","0").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"$name: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .repartition(32).cache()
    println("docs=" + docs.count())
    val (reps, links) = graft.operators.Dedup.collapseExact(docs, "doc_id", "text")
    t("collapseExact reps+links") { println("reps=" + reps.count() + " links=" + links.count()) }
    val withSig = reps.select(col("doc_id"), graft.operators.Dedup.simhash(col("text")).as("simhash")).cache()
    t("simhash sigs") { println("sigs=" + withSig.count()) }
    val chunks = withSig.select(col("doc_id"), col("simhash"),
      posexplode(transform(sequence(lit(0), lit(3)),
        i => call_function("shiftright", col("simhash"), i * lit(16))
          .bitwiseAND(lit((1L << 16) - 1)))).as(Seq("chunk_i", "chunk_v")))
    val buckets = chunks.groupBy(col("chunk_i"), col("chunk_v"))
      .agg(collect_list(struct(col("doc_id").as("k"), col("simhash").as("sig"))).as("ms")).cache()
    t("bucket agg") { println("buckets=" + buckets.count()) }
    t("bucket sizes") {
      buckets.select(col("chunk_i"), size(col("ms")).as("n"))
        .groupBy(col("chunk_i")).agg(max("n").as("max_n"), count(lit(1)).as("nb"),
          sum(when(col("n") > 600, col("n")).otherwise(0)).as("overcap_members"),
          sum(when(col("n") <= 600, col("n")*(col("n")-1)/2).otherwise(0)).as("full_pairs"))
        .orderBy("chunk_i").collect().foreach(println)
    }
    val pairs = graft.operators.Dedup.simhashPairs(reps, "doc_id", "text", 3, 600)
    t("simhashPairs full") { println("pairs=" + pairs.count()) }
    spark.stop()
  }
}
