package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{Condition, Conditions}

/** Condition-operator parity with the reference's apply_condition
  * (weiser/checks/base.py:46-70; tested there in
  * tests/unit/test_base_check.py:55-88).
  */
class ConditionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def eval(value: Option[Double], cond: Condition,
                   thr: Either[Double, (Double, Double)]): Boolean = {
    val df = Seq(value).toDF("v")
    df.select(Conditions.verdict(col("v"), cond, thr).as("ok"))
      .head().getBoolean(0)
  }

  test("gt/ge/lt/le/eq/neq semantics") {
    assert(eval(Some(5), Condition.Gt, Left(4)))
    assert(!eval(Some(4), Condition.Gt, Left(4)))
    assert(eval(Some(4), Condition.Ge, Left(4)))
    assert(eval(Some(3), Condition.Lt, Left(4)))
    assert(!eval(Some(4), Condition.Lt, Left(4)))
    assert(eval(Some(4), Condition.Le, Left(4)))
    assert(eval(Some(4), Condition.Eq, Left(4)))
    assert(eval(Some(5), Condition.Neq, Left(4)))
    assert(!eval(Some(4), Condition.Neq, Left(4)))
  }

  test("between is inclusive on both ends") {
    assert(eval(Some(1), Condition.Between, Right((1, 3))))
    assert(eval(Some(3), Condition.Between, Right((1, 3))))
    assert(eval(Some(2), Condition.Between, Right((1, 3))))
    assert(!eval(Some(0.999), Condition.Between, Right((1, 3))))
    assert(!eval(Some(3.001), Condition.Between, Right((1, 3))))
  }

  test("NULL actual value evaluates to fail (reference None => False)") {
    Condition.all.foreach { c =>
      val thr: Either[Double, (Double, Double)] =
        if (c == Condition.Between) Right((0, 1)) else Left(0)
      assert(!eval(None, c, thr), s"NULL must fail under ${c.name}")
    }
  }

  test("between with scalar threshold raises (reference ValueError)") {
    assertThrows[IllegalArgumentException] {
      Conditions.verdict(lit(1), Condition.Between, Left(1.0))
    }
  }

  test("property: between(lo,hi) <=> ge(lo) && le(hi) (seeded sample)") {
    // single-pass batch evaluation (one Spark job, 60 assertions)
    val rnd = new scala.util.Random(42)
    val cases = Seq.fill(60) {
      val a = rnd.nextDouble() * 20 - 10
      val b = rnd.nextDouble() * 20 - 10
      val v = rnd.nextDouble() * 20 - 10
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      (v, lo, hi)
    }
    val df = cases.toDF("v", "lo", "hi")
    val rows = df.select(
      (col("v") >= col("lo") && col("v") <= col("hi")).as("composed"),
      col("v").between(col("lo"), col("hi")).as("between")).collect()
    rows.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1)))
    // and via the compiled verdicts on a few literal thresholds
    cases.take(10).foreach { case (v, lo, hi) =>
      assert(eval(Some(v), Condition.Between, Right((lo, hi))) ==
        (eval(Some(v), Condition.Ge, Left(lo)) &&
          eval(Some(v), Condition.Le, Left(hi))))
    }
  }
}
