package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

/** The custom expressions are reachable from plain SQL through the
  * Catalyst function registry (SURVEY §4.3 mechanism). The shared test
  * JVM keeps one SparkSession, so the registry is populated directly
  * here; `GraftExtensions` itself (the spark.sql.extensions entry point
  * for fresh sessions) is applied to a raw extensions object to prove
  * the injection path is well-formed.
  */
class ExtensionsSpec extends AnyFunSuite with SparkTestBase {

  test("GraftExtensions applies cleanly to a SparkSessionExtensions") {
    new GraftExtensions()(new SparkSessionExtensions) // must not throw
  }

  test("rolling_hash and dot_product callable from SQL") {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("rolling_hash",
      exprs => graft.functions.RollingHash(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("dot_product",
      exprs => graft.functions.DotProduct(exprs.head, exprs(1)), "scala_udf")
    val r = spark.sql(
      """SELECT rolling_hash(array('a','b')) AS h,
        |       dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d
        |""".stripMargin).head()
    assert(r.getLong(0) > 0L)
    assert(r.getDouble(1) === 11.0)
  }
}
