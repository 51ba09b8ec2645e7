package graft

import org.apache.spark.sql.functions._

/** Scratch probe: plan shapes around FusedMeasuresExpr with the
  * deterministic flag removed. */
object FusedPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val pages = graft.sources.Pages.load(spark, "/root/testdata/sf0.001")

    def report(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.executedPlan.toString
      val n = "fused_measures".r.findAllIn(plan).length
      val pushed = "PushedFilters: [^\n]*".r.findFirstIn(plan).getOrElse("")
      val rs = "ReadSchema: [^\n]*".r.findFirstIn(plan).getOrElse("")
      println(s"== $name: fused x$n | $pushed | $rs")
    }

    val run = graft.operators.QualityFilter.run(pages)
    report("select subset", run.select("url", "keep", "scrubbed_text",
      "lang_pred", "ppl"))
    report("filter url AFTER run", run.filter(col("url").startsWith("https://h")))
    report("filter keep AFTER run", run.filter(col("keep")))
    report("filter keep + select", run.filter(col("keep")).select("url", "scrubbed_text"))
    spark.stop()
  }
}
