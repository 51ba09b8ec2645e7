package graft.plans

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable.ArrayBuffer

/** Single-pass (median, MAD, last) typed aggregator — the custom aggregate
  * SURVEY.md §2.10 flags as the one justified custom expression: the
  * two-pass built-in formulation (groupBy median, join back, groupBy
  * median(abs(x-med))) shuffles the history twice; this computes all three
  * statistics in one shuffle.
  *
  * Exactness matters (BASELINE.md anomaly parity): DuckDB's mad()/median()
  * are exact, so the buffer holds the values (metric histories are capped
  * at 10k rows per group — reference anomaly.py:127 — so the buffer is
  * bounded and small). Median of an even count is the mean of the two
  * middle values, matching DuckDB.
  */
object MadAggregate {

  final case class MadStats(median: Double, mad: Double, last: Double, n: Long)

  /** input: (actual_value, run_time_micros) */
  type In = (Double, Long)

  final case class Buf(values: ArrayBuffer[Double], var lastTs: Long,
                       var lastVal: Double)

  val agg: Aggregator[In, Buf, MadStats] = new Aggregator[In, Buf, MadStats] {
    def zero: Buf = Buf(ArrayBuffer.empty, Long.MinValue, 0.0)

    def reduce(b: Buf, a: In): Buf = {
      b.values += a._1
      if (a._2 >= b.lastTs) { b.lastTs = a._2; b.lastVal = a._1 }
      b
    }

    def merge(b1: Buf, b2: Buf): Buf = {
      b1.values ++= b2.values
      if (b2.lastTs >= b1.lastTs) { b1.lastTs = b2.lastTs; b1.lastVal = b2.lastVal }
      b1
    }

    private def exactMedian(sorted: Array[Double]): Double = {
      val n = sorted.length
      if (n == 0) 0.0
      else if (n % 2 == 1) sorted(n / 2)
      else (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0
    }

    def finish(b: Buf): MadStats = {
      val arr = b.values.toArray
      java.util.Arrays.sort(arr)
      val med = exactMedian(arr)
      val devs = arr.map(v => math.abs(v - med))
      java.util.Arrays.sort(devs)
      MadStats(med, exactMedian(devs), b.lastVal, arr.length)
    }

    def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    def outputEncoder: Encoder[MadStats] = Encoders.product[MadStats]
  }

  def column: TypedColumn[In, MadStats] = agg.toColumn
}
