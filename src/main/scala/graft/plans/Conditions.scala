package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compiles a check's (condition, threshold) pair into a verdict Column.
  *
  * Reference semantics (weiser/checks/base.py:46-70):
  *   - gt/ge/lt/le/eq/neq scalar compares
  *   - between is INCLUSIVE on both ends and requires a 2-element threshold
  *   - a NULL actual value evaluates to false (fail) — `if value is None:
  *     return False`
  * The NULL=>fail rule is preserved with coalesce(pred, false), evaluated
  * once at plan time per check — not per row in interpreted code.
  */
object Conditions {
  def verdict(actual: Column, condition: Condition,
              threshold: Either[Double, (Double, Double)]): Column = {
    val pred = (condition, threshold) match {
      case (Condition.Gt, Left(t))        => actual > lit(t)
      case (Condition.Ge, Left(t))        => actual >= lit(t)
      case (Condition.Lt, Left(t))        => actual < lit(t)
      case (Condition.Le, Left(t))        => actual <= lit(t)
      case (Condition.Eq, Left(t))        => actual === lit(t)
      case (Condition.Neq, Left(t))       => actual =!= lit(t)
      case (Condition.Between, Right((lo, hi))) =>
        actual >= lit(lo) && actual <= lit(hi)
      case (Condition.Between, Left(_)) =>
        throw new IllegalArgumentException(
          "Condition 'between' requires a threshold list with two elements")
      case (c, Right(_)) =>
        throw new IllegalArgumentException(
          s"Condition '${c.name}' requires a scalar threshold")
    }
    coalesce(pred, lit(false))
  }
}
