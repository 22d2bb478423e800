package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ANN quality + exactness properties for the similarity operators. */
class SimilaritySpec extends AnyFunSuite with SparkTestBase {

  test("planted duplicate vector is its own top-1 neighbor at sim 1.0") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val v = Seq.fill(64)(rng.nextGaussian().toFloat)
    val noise = Seq.fill(8)(Seq.fill(64)(rng.nextGaussian().toFloat))
    val rows = (Seq(v, v) ++ noise).zipWithIndex.map { case (e, i) => (i.toLong, e) }
    val df = rows.toDF("vec_id", "embedding")
    val top1 = Similarity.pairSims(df)
      .filter($"id_a" === 0L).orderBy($"sim".desc).head()
    assert(top1.getLong(1) === 1L)
    assert(top1.getDouble(2) === 1.0)
  }

  test("ANN LSH recall@3 vs brute force on sf0.001 embeddings") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val brute = Similarity.pairSims(emb)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_a")).orderBy(col("sim").desc, col("id_b"))
    val exact = brute.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annTopK(emb, 3)
      .select(col("vec_id"), col("neighbor")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // Pinned floor just below the measured value (round 5: 32 tables ×
    // 8 bits × 3-flip multiprobe = 0.984 here and at sf0.01 — the
    // deterministic planes make the measurement exact) so a regression
    // in the hashing/probing FAILS here — the round-3 `> 0.0` gate would
    // have passed a broken index, and the round-4 0.45 floor
    // institutionalized a low-recall one (VERDICT r4).
    val recall = (ann & exact).size.toDouble / exact.size
    assert(ann.nonEmpty, "ANN produced no candidates")
    assert(recall >= 0.95, s"LSH recall@3 regressed: $recall (floor 0.95)")
  }

  test("IVF ANN recall@3 beats unclustered probing odds on sf0.001") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val exact = Similarity.bruteTopK(emb, 3)
      .select(col("vec_id"), col("neighbor")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, 3) // ships nlist=16, nprobe=12
      .select(col("vec_id"), col("neighbor")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf & exact).size.toDouble / exact.size
    // floor pinned just below the measured value (round 5, nprobe=12:
    // 0.957 here, 0.949 at sf0.01 — deterministic quantizer sample) so a
    // quantizer regression fails rather than degrading silently
    assert(recall >= 0.90, s"IVF recall@3 regressed: $recall (floor 0.90)")
  }

  test("cosine fold matches a hand-computed dot product") {
    import spark.implicits._
    val a = Seq(1.0f, 2.0f, 3.0f) ++ Seq.fill(61)(0.0f)
    val b = Seq(4.0f, 5.0f, 6.0f) ++ Seq.fill(61)(0.0f)
    val df = Seq((0L, a), (1L, b)).toDF("vec_id", "embedding")
    val sim = Similarity.pairSims(df).filter($"id_a" === 0L).head().getDouble(2)
    val want = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(sim - (math.rint(want * 1e6) / 1e6)) < 1e-9)
  }

  test("thresholdJoin equals the all-pairs cross join (exactness)") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val brute = asSet(Similarity.pairSims(emb)
      .filter(col("id_a") < col("id_b") && col("sim") >= 0.45))
    // both gate arms: default (broadcast kernel) and forced cell path
    val pruned = asSet(Similarity.thresholdJoin(emb, 0.45))
    assert(pruned === brute)
    assert(asSet(Similarity.thresholdJoin(emb, 0.45, broadcastLimit = 0)) === brute)
    // and under a looser threshold (more admissible cell pairs)
    val brute2 = asSet(Similarity.pairSims(emb)
      .filter(col("id_a") < col("id_b") && col("sim") >= 0.2))
    val pruned2 = asSet(Similarity.thresholdJoin(emb, 0.2, broadcastLimit = 0))
    assert(pruned2 === brute2)
  }

  test("l3e delta assignment is the true nearest frozen centroid (brute check)") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val got = graft.operators.Similarity.incrementalIndex(emb)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.nonEmpty)
    // re-read the dumped frozen quantizer and recompute every argmax
    val cents = spark.read
      .parquet(graft.operators.Dedup.policyDumpPath("l3e_centroids"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    val deltas = emb.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map(p => p._1 * p._2).sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    assert(deltas.nonEmpty && deltas.forall { case (id, v) =>
      val best = cents.toSeq.map { case (c, ct) => (cos(v, ct), c) }
        .maxBy(p => (p._1, -p._2))._2
      got(id) == best
    })
  }

  test("quantizer-based operators return empty results on an empty corpus") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(Similarity.thresholdJoin(empty, 0.5).count() === 0)
    assert(Similarity.ivfTopK(empty, 3).count() === 0)
    assert(Similarity.exactTopK(empty, 3).count() === 0)
    assert(Similarity.semDedup(empty, 0.9).count() === 0)
  }

  test("semDedup keeps exactly the min-id of each planted duplicate group") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    // 3 dup groups of sizes 3/2/2 (exact copies → cosine 1.0, so they
    // land in the same k-means cell by construction) + 8 distinct
    val bases = Seq.fill(3)(Seq.fill(64)(rng.nextGaussian().toFloat))
    val dups = bases(0) +: bases(0) +: bases(0) +:
      bases(1) +: bases(1) +: bases(2) +: bases(2) +: Nil
    val distinctV = Seq.fill(8)(Seq.fill(64)(rng.nextGaussian().toFloat))
    val rows = (dups ++ distinctV).zipWithIndex.map { case (e, i) => (i.toLong, e) }
    val df = rows.toDF("vec_id", "embedding")
    val kept = Similarity.semDedup(df, 0.999, nlist = 4, trainPerList = 4)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // one survivor per dup group, and it is the smallest id (0, 3, 5)
    assert(Set(0L, 3L, 5L).subsetOf(kept))
    assert(Seq(1L, 2L, 4L, 6L).forall(!kept.contains(_)))
    // distinct vectors all survive (random gaussians: cosine ≪ 0.999)
    assert((7L until 15L).forall(kept.contains))
  }

  test("l12b policy twin survivors ≡ l12 semDedup survivors (fixture + planted chain)") {
    // the dump-and-recompute twin must implement the SAME greedy
    // min-id-first policy as the production entry — on the real fixture
    // (both code paths end-to-end) …
    def survivors(name: String) =
      Similarity.queries(name)(spark, sf("sf0.001"))
        .select("vec_id").collect().map(_.getLong(0)).toSet
    val l12 = survivors("l12_semdedup")
    assert(l12 === survivors("l12b_semdedup_policy"))
    assert(l12.nonEmpty)
    // … and on a planted similarity CHAIN a—b—c (a~b, b~c, a≁c), where
    // greedy keeps {a, c} but the naive drop-any-larger-of-a-pair
    // policy would also drop c — the case that separates the two
    import spark.implicits._
    val base = Seq.fill(64)(0.0f).updated(0, 1.0f)
    def mix(theta: Double) = base.zipWithIndex.map { case (v, i) =>
      if (i == 0) math.cos(theta).toFloat
      else if (i == 1) math.sin(theta).toFloat else v }
    // cos(a,b)=cos(0.6)≈0.825, cos(b,c)=cos(0.6)≈0.825, cos(a,c)=cos(1.2)≈0.362
    val df = Seq((0L, base), (1L, mix(0.6)), (2L, mix(1.2)))
      .toDF("vec_id", "embedding")
    val edges = Similarity.semClusterEdges(df, 0.8, nlist = 1, trainPerList = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(edges === Set((0L, 1L), (1L, 2L)))
    val removed = Similarity.greedyRemovedFromEdges(
        Similarity.semClusterEdges(df, 0.8, nlist = 1, trainPerList = 4))
      .collect().map(_.getLong(0)).toSet
    assert(removed === Set(1L)) // greedy: keep 0, drop 1, KEEP 2
    val keptSem = Similarity.semDedup(df, 0.8, nlist = 1, trainPerList = 4)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(keptSem === Set(0L, 2L))
  }

  test("l4c policy twin survivors ≡ l4b embedding-dedup survivors (r17)") {
    // the dump-and-recompute twin must reproduce the production entry's
    // drop-the-larger-id survivor set exactly — l4c is the linear form
    // the sf1 gate hashes where l4b's all-pairs oracle cannot run
    def survivors(name: String) =
      Similarity.queries(name)(spark, sf("sf0.001"))
        .select("vec_id").collect().map(_.getLong(0)).toSet
    val l4b = survivors("l4b_embedding_dedup")
    assert(l4b === survivors("l4c_embedding_dedup_policy"))
    assert(l4b.nonEmpty)
  }

  test("blockTopK equals bruteTopK and exactTopK gate picks the block path") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val brute = asSet(Similarity.bruteTopK(emb, 3))
    assert(asSet(Similarity.blockTopK(emb, 3, nBlocks = 4)) === brute)
    // a gate of 0 forces the block path; results still exact
    assert(asSet(Similarity.exactTopK(emb, 3, broadcastLimit = 0L)) === brute)
  }

  test("topKAgainst: broadcast and block arms agree on a filtered side") {
    // the l3f shape (VERDICT r12 finding 1): candidates = a metadata-
    // filtered subset expressed as a LEFT SEMI join, queries = the corpus
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val ids = emb.filter(col("vec_id") % 3 =!= 0).select(col("vec_id"))
    val cands = emb.join(ids, Seq("vec_id"), "left_semi")
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val bcastArm = Similarity.topKAgainst(emb, cands, 3)
    val blockArm = Similarity.topKAgainst(emb, cands, 3, broadcastLimit = 0L)
    assert(asSet(bcastArm) === asSet(blockArm))
    assert(asSet(bcastArm).nonEmpty)
  }

  test("topKAgainst gate: arm selection is pinned at both sizes") {
    // broadcast arm: candidates are collected driver-side, so the
    // RETURNED plan has no Join at all; block arm: the block-pair
    // machinery plans the pid equi-join (plus the semi join and the two
    // broadcast pairIds joins). The semi-join candidate shape keeps the
    // Catalyst size estimate at the corpus upper bound, so the fixture
    // corpus sits under the default gate (broadcast), and a gate of 0
    // provably selects the distributed arm.
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val ids = emb.select(col("vec_id"))
    val cands = emb.join(ids, Seq("vec_id"), "left_semi")
    def joins(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.size
    assert(joins(Similarity.topKAgainst(emb, cands, 3)) === 0)
    assert(joins(Similarity.topKAgainst(emb, cands, 3, broadcastLimit = 0L)) >= 2)
  }
}
