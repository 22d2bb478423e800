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

  test("ensureFunctions late-attaches the registry entries idempotently") {
    GraftExtensions.ensureFunctions(spark)
    GraftExtensions.ensureFunctions(spark) // second call must be a no-op
    val r = spark.sql(
      """SELECT rolling_hash(array('a','b')) AS h,
        |       dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d
        |""".stripMargin).head()
    assert(r.getLong(0) > 0L)
    assert(r.getDouble(1) === 11.0)
    // and the DSL fingerprint entry agrees with the SQL-name path
    val viaSql = spark.sql("SELECT rolling_hash(array('x','yz')) AS h").head().getLong(0)
    import spark.implicits._
    val viaDsl = Seq(Seq("x", "yz")).toDF("t")
      .select(graft.functions.RollingHash.rollingHash(
        org.apache.spark.sql.functions.col("t")).as("h"))
      .head().getLong(0)
    assert(viaSql === viaDsl)
  }

  test("kll sketch trio callable from SQL (build → union → quantile)") {
    GraftExtensions.ensureFunctions(spark)
    val r = spark.sql(
      """SELECT kll_get_quantile(kll_union_agg(sk), 0.5d) AS med FROM (
        |  SELECT grp, kll_sketch_agg(v) AS sk FROM (
        |    SELECT id % 4 AS grp, CAST(id AS DOUBLE) AS v FROM range(1000)
        |  ) GROUP BY grp
        |)""".stripMargin).head()
    // values 0..999 sharded by id%4 then unioned: median within rank err
    assert(math.abs(r.getDouble(0) - 500.0) <= 30.0)
  }

  test("theta sketch set algebra callable from SQL (build → union → intersect/diff)") {
    GraftExtensions.ensureFunctions(spark)
    // keys 0..99 in segment a, 50..149 in b: |a|=|b|=100, |a∩b|=50,
    // |a\b|=50 — exact mode, so the SQL names must return true counts
    val r = spark.sql(
      """WITH s AS (
        |  SELECT seg, theta_sketch_agg(k) AS sk FROM (
        |    SELECT 'a' AS seg, id AS k FROM range(100)
        |    UNION ALL
        |    SELECT 'b' AS seg, id + 50 AS k FROM range(100)
        |  ) GROUP BY seg
        |), m AS (
        |  SELECT theta_union_agg(CASE WHEN seg = 'a' THEN sk END) AS a,
        |         theta_union_agg(CASE WHEN seg = 'b' THEN sk END) AS b
        |  FROM s
        |)
        |SELECT theta_estimate(a) AS na, theta_estimate(b) AS nb,
        |  theta_estimate(theta_intersect(a, b)) AS nboth,
        |  theta_estimate(theta_a_not_b(a, b)) AS nonly
        |FROM m""".stripMargin).head()
    assert(r.getDouble(0) === 100.0)
    assert(r.getDouble(1) === 100.0)
    assert(r.getDouble(2) === 50.0)
    assert(r.getDouble(3) === 50.0)
  }

  test("might_contain probes a serialized bloom filter from SQL") {
    import spark.implicits._
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("might_contain",
      exprs => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs.head, exprs(1)), "scala_udf")
    val bloom = Seq(1L, 2L, 3L).toDF("k").stat.bloomFilter("k", 100, 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    // the bloom argument must be foldable: inline it as a binary literal
    val hex = bos.toByteArray.map(b => f"$b%02X").mkString
    val probed = Seq(1L, 2L, 3L, 999999L).toDF("k")
      .selectExpr("k", s"might_contain(X'$hex', k) AS hit")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(probed(1L) && probed(2L) && probed(3L)) // no false negatives
    assert(!probed(999999L)) // fpp 1% at n=4: a hit here is ~impossible
  }
}
