package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared expression helpers.
  *
  * Cross-engine determinism: the driver hash-compares our results against
  * DuckDB over the same parquet. `SUM(double)` is order-dependent in the
  * last ulp, and Spark/DuckDB sum in different orders — so every money
  * aggregate is accumulated as a scaled LONG: the fixture money columns
  * carry exactly `dp` fractional digits (FIXTURES.md §1), so
  * `round(x * 10^dp)` is an exact integer per row and the long sum is
  * order-independent (partial aggregation / AQE re-planning cannot change
  * it). Both engines evaluate the identical IEEE-754 expression tree per
  * row, so the rounded integers — and therefore the final doubles — match
  * bit for bit.
  *
  * This replaced a DECIMAL(18,2) accumulation (round 4): decimal products
  * promote past the compact-long precision ceiling (18), dropping every row
  * into java.math.BigDecimal — a ~13x CPU tax on TPC-H Q1-shaped aggregates
  * (VERDICT r4 item 2). Long adds stay primitive in the hash-agg buffer and
  * inside whole-stage codegen.
  *
  * Overflow headroom: a 2-dp scaled long overflows at ~9.2e16 in column
  * units — at TPC-H sf100k (~100 TB) the largest money sum is ~2.4e14, five
  * orders of magnitude inside the ceiling; 6-dp products overflow at
  * ~9.2e12, still >30x above the sf100k sum_charge (~2.4e11 per group with
  * >=6 groups). For sums beyond that, shard the aggregate or fall back to
  * decimal.
  */
object Exprs {
  private def p10(dp: Int): Double = math.pow(10, dp).round.toDouble

  /** Exact scaled-long view of a value carrying <= dp fractional digits. */
  def slong(c: Column, dp: Int): Column = round(c * p10(dp)).cast(LongType)

  /** Order-independent SUM over a value with <= dp fractional digits,
    * returned as DOUBLE. Use dp=2 for raw money columns, dp=4 for a product
    * of two 2-dp columns, dp=6 for three.
    */
  def lsum(c: Column, dp: Int): Column = sum(slong(c, dp)).cast(DoubleType) / p10(dp)

  /** Order-independent SUM over a 2-dp double column, returned as DOUBLE. */
  def dsum(c: Column): Column = lsum(c, 2)

  /** Order-independent AVG: exact scaled-long sum divided by count. */
  def davg(c: Column): Column = (lsum(c, 2) / count(c)).cast(DoubleType)

  /** Dialect-neutral SQL twins (valid in both Spark SQL and DuckDB: ROUND
    * on DOUBLE, BIGINT cast, SUM-to-DOUBLE cast behave identically; the
    * scale literal `1e<dp>` parses as DOUBLE in both).
    */
  def sqlLsum(x: String, dp: Int): String =
    s"CAST(SUM(CAST(ROUND(($x) * 1e$dp, 0) AS BIGINT)) AS DOUBLE) / 1e$dp"
  def sqlDsum(x: String): String = sqlLsum(x, 2)
  def sqlDavg(x: String): String =
    s"CAST(${sqlLsum(x, 2)} / COUNT($x) AS DOUBLE)"
}
