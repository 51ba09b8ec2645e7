package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans._

/** MAD z-score parity with the reference (weiser/checks/anomaly.py:55-96):
  * <5 points => fail, truncate(MAD)==0 => z=0, spike detection, per-dim
  * split on the first dimension.
  */
class AnomalySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def history(values: Seq[Double], dim: String = "d0") =
    values.zipWithIndex.map { case (v, i) =>
      (dim, v, java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 00:00:00"),
        "chk1")
    }.toDF("dim", "actual_value", "run_time", "check_id")

  private val check = Check("an", Seq("metrics"), CheckType.Anomaly,
    condition = Condition.Between, threshold = Right((-3.5, 3.5)),
    checkId = Some("chk"))

  test("fewer than 5 points => automatic fail with last value") {
    val rows = AnomalyJob.run(check, history(Seq(1, 2, 3, 4))).collect()
    assert(rows.length == 1)
    assert(!rows(0).getAs[Boolean]("success"))
    assert(rows(0).getAs[Double]("actual_value") == 4.0)
  }

  test("constant series: MAD=0 => z=0 => success") {
    val rows = AnomalyJob.run(check, history(Seq.fill(10)(7.0))).collect()
    assert(rows(0).getAs[Double]("z_score") == 0.0)
    assert(rows(0).getAs[Boolean]("success"))
  }

  test("spike beyond 3.5 robust z-scores fails") {
    val vals = Seq.fill(20)(10.0).zipWithIndex.map { case (v, i) =>
      v + (i % 5) } :+ 500.0 // stable history, huge final spike
    val rows = AnomalyJob.run(check, history(vals)).collect()
    assert(math.abs(rows(0).getAs[Double]("z_score")) > 3.5)
    assert(!rows(0).getAs[Boolean]("success"))
  }

  test("z-score formula: 0.6745 * (last - median) / MAD") {
    // values 1..9 (odd count): median=5, MAD=median(|x-5|)=2, last=9
    val rows = AnomalyJob.run(check, history((1 to 9).map(_.toDouble))).collect()
    val z = rows(0).getAs[Double]("z_score")
    assert(math.abs(z - 0.6745 * (9 - 5) / 2.0) < 1e-12)
    assert(rows(0).getAs[Boolean]("success"))
  }

  test("per-dimension mode: split by first dimension (anomaly.py:28-47)") {
    val h = history(Seq(1, 1, 1, 1, 1, 1), "en")
      .unionByName(history(Seq(2, 3), "fr"))
    val rows = AnomalyJob.run(check.copy(dimensions = Seq("dim")), h)
      .collect().sortBy(_.getAs[String]("dim"))
    assert(rows.length == 2)
    assert(rows(0).getAs[Boolean]("success"))   // en: constant, 6 pts
    assert(!rows(1).getAs[Boolean]("success"))  // fr: only 2 pts => fail
    assert(rows(1).getAs[String]("name") == "an_dim_fr")
  }

  test("check_id prefix filter (anomaly.py LIKE 'id%')") {
    val h = history(Seq(1, 2, 3, 4, 5, 6))
      .withColumn("check_id",
        when(col("actual_value") > 3, lit("other")).otherwise(lit("chk1")))
    val rows = AnomalyJob.run(check, h).collect()
    // only the 3 chk-prefixed rows remain => <5 => fail
    assert(rows(0).getAs[Long]("n") == 3)
    assert(!rows(0).getAs[Boolean]("success"))
  }
}
