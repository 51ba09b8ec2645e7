package graft

object PplProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val pages = graft.sources.GoldenCorpus.generate(spark)
    val scored = graft.functions.ModelScores.withScores(
      pages.select(col("url"), col("text")), "text")
      .select(col("url"), col("ppl")).collect()
      .map(r => r.getString(0).split("/").last.toInt -> r.getDouble(1))
    def cls(i: Int): String =
      if (i >= 280) "newlang-prose"
      else if (i >= 240) (if (i % 2 == 0) "nav-menu" else "code")
      else Seq("prose","prose","prose","prose","prose","prose","utf8",
        "pii","duplines","short","symbolsoup","stuffing")(i % 12)
    scored.groupBy(p => cls(p._1)).toSeq.sortBy(_._1).foreach { case (c, xs) =>
      val v = xs.map(_._2).sorted
      println(f"PPL $c%-14s n=${v.length}%3d min=${v.head}%10.2f med=${v(v.length/2)}%10.2f max=${v.last}%12.2f")
    }
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val d2 = graft.functions.ModelScores.withScores(
      docs.select(col("doc_id"), col("text")), "text")
      .select(col("ppl")).collect().map(_.getDouble(0)).sorted
    println(f"PPL sf0.001-docs   n=${d2.length} min=${d2.head}%10.2f med=${d2(d2.length/2)}%10.2f p99=${d2((d2.length*0.99).toInt)}%10.2f max=${d2.last}%12.2f")
    spark.stop()
  }
}
