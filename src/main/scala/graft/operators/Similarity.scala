package graft.operators

import graft.Tables
import graft.Tables.Q
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding similarity search (SURVEY.md §2B L3/L4 + ANN scale path).
  *
  * Numerics: cosine is computed in DOUBLE with an explicit left-to-right
  * fold (`aggregate(zip_with(...))`) and mirrored term-for-term in the
  * DuckDB oracle (`list_dot_product` over `DOUBLE[]` casts), then rounded
  * to 6dp *before* ranking so both engines rank identical values —
  * cross-engine float drift can't flip a top-k boundary.
  *
  * Scale: brute-force top-k is O(n·m) and exists as the correctness
  * baseline; the production path is the random-hyperplane LSH variant
  * (l3b) whose cost is bounded by bucket occupancy. At 100 TB the bucket
  * join is an equi-shuffle on the signature — no cross join anywhere.
  */
object Similarity {

  private def dotCol(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** (vec_id, emb ARRAY<DOUBLE>, norm DOUBLE) */
  def vecs(embeddings: DataFrame): DataFrame =
    embeddings.select(
      col("vec_id"),
      col("embedding").cast(ArrayType(DoubleType)).as("emb"))
      .withColumn("norm", sqrt(dotCol(col("emb"), col("emb"))))

  /** All-pairs cosine (a.vec_id, b.vec_id, sim rounded to 6dp). */
  def pairSims(embeddings: DataFrame): DataFrame = {
    val a = vecs(embeddings).select(col("vec_id").as("id_a"), col("emb").as("ea"), col("norm").as("na"))
    val b = vecs(embeddings).select(col("vec_id").as("id_b"), col("emb").as("eb"), col("norm").as("nb"))
    a.crossJoin(b).filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dotCol(col("ea"), col("eb")) / (col("na") * col("nb")), 6).as("sim"))
  }

  /** Deterministic random hyperplanes for the LSH signature. */
  private val NumPlanes = 12
  private lazy val planes: Seq[Seq[Double]] = {
    val rng = new scala.util.Random(42)
    Seq.fill(NumPlanes)(Seq.fill(64)(rng.nextGaussian()))
  }

  private def bucketCol(emb: Column): Column =
    planes.zipWithIndex.map { case (hp, j) =>
      when(dotCol(emb, typedlit(hp)) > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  val queries: Map[String, Q] = Map(
    // L3: brute-force cosine top-5 neighbors per vector (exact baseline).
    "l3_cosine_topk" -> ((s, d) => {
      val w = Window.partitionBy(col("id_a"))
        .orderBy(col("sim").desc, col("id_b"))
      pairSims(Tables.embeddings(s, d))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("id_a").as("vec_id"), col("id_b").as("neighbor"),
          col("sim"), col("rn"))
    }),

    // L4: similarity self-join with threshold (unordered pairs).
    "l4_cosine_threshold" -> ((s, d) => {
      pairSims(Tables.embeddings(s, d))
        .filter(col("id_a") < col("id_b") && col("sim") >= 0.45)
        .select(col("id_a"), col("id_b"), col("sim"))
    }),

    // L3b: ANN — random-hyperplane LSH buckets, then exact top-3 within
    // bucket. Not SQL-expressible (seeded hyperplanes) → rows-only +
    // recall spec against the l3 baseline.
    "l3b_ann_lsh" -> ((s, d) => annTopK(Tables.embeddings(s, d), 3))
  )

  /** ANN top-k via random-hyperplane LSH buckets (public for specs). */
  def annTopK(embeddings: DataFrame, k: Int): DataFrame = {
    {
      val v = vecs(embeddings).withColumn("bucket", bucketCol(col("emb")))
      val a = v.select(col("vec_id").as("id_a"), col("emb").as("ea"),
        col("norm").as("na"), col("bucket"))
      val b = v.select(col("vec_id").as("id_b"), col("emb").as("eb"),
        col("norm").as("nb"), col("bucket"))
      val w = Window.partitionBy(col("id_a"))
        .orderBy(col("sim").desc, col("id_b"))
      a.join(b, Seq("bucket")).filter(col("id_a") =!= col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(dotCol(col("ea"), col("eb")) / (col("na") * col("nb")), 6).as("sim"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .select(col("id_a").as("vec_id"), col("id_b").as("neighbor"),
          col("sim"), col("rn"))
    }
  }

  private val simSql =
    """WITH v AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
      |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |                          CAST(embedding AS DOUBLE[]))) AS nrm
      |  FROM embeddings
      |), p AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |    round(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 6) AS sim
      |  FROM v a JOIN v b ON a.vec_id <> b.vec_id
      |)""".stripMargin

  val oracles: Map[String, String] = Map(
    "l3_cosine_topk" ->
      s"""$simSql
         |SELECT id_a AS vec_id, id_b AS neighbor, sim, rn FROM (
         |  SELECT id_a, id_b, sim,
         |    ROW_NUMBER() OVER (PARTITION BY id_a ORDER BY sim DESC, id_b) AS rn
         |  FROM p) WHERE rn <= 5""".stripMargin,

    "l4_cosine_threshold" ->
      s"""$simSql
         |SELECT id_a, id_b, sim FROM p
         |WHERE id_a < id_b AND sim >= 0.45""".stripMargin
  )
}
