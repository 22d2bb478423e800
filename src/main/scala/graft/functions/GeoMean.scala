package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed UDAF (SURVEY.md §2B A9): geometric mean via log-sum.
  *
  * `Aggregator[IN, BUF, OUT]` gets partial aggregation for free — `merge`
  * combines map-side buffers, so the shuffle carries one (sumLn, n) pair
  * per partition per group, not the input rows. Oracle twin:
  * DuckDB `exp(avg(ln(x)))`.
  */
object GeoMean extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), x: Double): (Double, Long) =
    if (x > 0) (b._1 + math.log(x), b._2 + 1) else b
  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(b: (Double, Long)): Double =
    if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column form, usable in `agg(...)`. */
  def column(c: Column): Column = udaf(GeoMean).apply(c)
}
