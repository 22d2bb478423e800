package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the driver contract itself: the queries/oracles maps
  * are merged with `++` across modules, so a duplicated key would
  * silently SHADOW an operator (the driver would still report green —
  * for the wrong query). These checks fail the build instead.
  */
class RegistrySpec extends AnyFunSuite {

  private val modules: Seq[(String, Map[String, _], Map[String, String])] = Seq(
    ("Projections", operators.Projections.queries, operators.Projections.oracles),
    ("Aggregates", operators.Aggregates.queries, operators.Aggregates.oracles),
    ("Joins", operators.Joins.queries, operators.Joins.oracles),
    ("Windows", operators.Windows.queries, operators.Windows.oracles),
    ("SetOps", operators.SetOps.queries, operators.SetOps.oracles),
    ("ScalarFns", functions.ScalarFns.queries, functions.ScalarFns.oracles),
    ("Dedup", operators.Dedup.queries, operators.Dedup.oracles),
    ("Similarity", operators.Similarity.queries, operators.Similarity.oracles),
    ("TextAnalysis", operators.TextAnalysis.queries, operators.TextAnalysis.oracles),
    ("Multimodal", operators.Multimodal.queries, operators.Multimodal.oracles),
    ("Ingest", sources.Ingest.queries, sources.Ingest.oracles),
    ("SqlFrontend", operators.SqlFrontend.queries, operators.SqlFrontend.oracles),
    ("Sketches", operators.Sketches.queries, operators.Sketches.oracles),
    ("PipelineOps", operators.PipelineOps.queries, operators.PipelineOps.oracles),
    ("Pq", operators.Pq.queries, operators.Pq.oracles),
    ("Bpe", operators.Bpe.queries, operators.Bpe.oracles),
    ("Streams", streaming.Streams.queries, streaming.Streams.oracles))

  test("no query key is defined by two modules (shadowing)") {
    val all = modules.flatMap { case (m, qs, _) => qs.keys.map(_ -> m) }
    val dups = all.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty, s"duplicated query keys: ${dups.map {
      case (k, ms) => s"$k in ${ms.map(_._2).mkString("+")}" }.mkString(", ")}")
    assert(all.size === SparkEntry.queries.size)
  }

  test("every oracle key has a query; oracle SQL is non-empty") {
    val qKeys = SparkEntry.queries.keySet
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(qKeys.contains(k), s"oracle without query: $k")
      assert(sql.trim.nonEmpty, s"empty oracle SQL: $k")
    }
  }

  test("bench short keys (id prefix before first '_') are unique") {
    // Bench's final stdout line must fit the driver's 2000-char tail, so
    // it keys the per-query map by the id prefix (`l2c_shingle_jaccard`
    // → `l2c`). A collision would silently merge two timings.
    val shorts = SparkEntry.queries.keys.toSeq.map(_.takeWhile(_ != '_'))
    val dups = shorts.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"colliding bench short keys: ${dups.mkString(", ")}")
  }

  test("module spot-check: RegistrySpec knows every SparkEntry module") {
    // if a new module is added to SparkEntry but not here, the key-count
    // equality above would miss its internal duplicates — pin the count
    assert(modules.map(_._2.size).sum === SparkEntry.queries.size,
      "RegistrySpec module list is out of date with SparkEntry.modules")
  }
}
