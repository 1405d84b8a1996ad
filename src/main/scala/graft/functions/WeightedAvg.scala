package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface: weighted average as an
  * `Aggregator[(value, weight), (sumWX, sumW), Double]`.
  *
  * Demonstrates the engine's custom-aggregate tier (SURVEY §7.6: none
  * REQUIRED for parity — this is the documented extension point). The
  * reduction is commutative/associative over doubles: distributed partial
  * merges are the standard sum-pair combine, identical shape to Spark's own
  * avg implementation.
  */
object WeightedAvg
    extends Aggregator[(Double, Double), (Double, Double), java.lang.Double] {
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
    (b._1 + a._1 * a._2, b._2 + a._2)
  override def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
    (x._1 + y._1, x._2 + y._2)
  // SQL NULL (not NaN) for a zero total weight — matches the DuckDB oracle's
  // sum(value*k)/sum(k), which is NULL when a group has no non-zero weights
  override def finish(r: (Double, Double)): java.lang.Double =
    if (r._2 == 0.0) null else java.lang.Double.valueOf(r._1 / r._2)
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
}
