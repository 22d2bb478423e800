package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared expression helpers.
  *
  * Cross-engine determinism: the driver hash-compares our results against
  * DuckDB over the same parquet. `SUM(double)` is order-dependent in the
  * last ulp, and Spark/DuckDB sum in different orders — so every money
  * aggregate goes through an exact DECIMAL accumulation and only the final
  * scalar is cast back to DOUBLE. The fixture money columns carry exactly
  * 2 fractional digits (FIXTURES.md §1), so the DECIMAL(18,2) cast is
  * lossless. This also holds at 100 TB: decimal sums are associative, so
  * partial aggregation / AQE re-planning cannot change the result.
  */
object Exprs {
  val D18_2: DecimalType = DecimalType(18, 2)
  val D18_4: DecimalType = DecimalType(18, 4)

  /** Exact decimal view of a 2-dp money column. */
  def dec(c: Column): Column = c.cast(D18_2)

  /** Order-independent SUM over a 2-dp double column, returned as DOUBLE. */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** Order-independent AVG: exact decimal sum divided by count. */
  def davg(c: Column): Column =
    (sum(dec(c)).cast(DoubleType) / count(c)).cast(DoubleType)

  /** DuckDB twins of the above, for oracle SQL strings. */
  def sqlDsum(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE)"
  def sqlDavg(x: String): String =
    s"CAST(CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE) / COUNT($x) AS DOUBLE)"
}
