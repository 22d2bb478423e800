package graft.operators

import graft.Tables.Q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization for embedding compression + ADC search
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011 — public method, re-implemented from the paper).
  *
  * Each unit-normalized vector is cut into `m` subvectors; a per-subspace
  * L2 kmeans codebook (ksub centroids, trained driver-side on a bounded
  * deterministic sample) maps every subvector to one byte. A 64-float
  * embedding becomes `m` bytes — 32× smaller — which is what makes a
  * 100 TB embedding corpus hold an in-memory index at all: the ENCODED
  * corpus broadcasts (m+8 bytes/vector ≈ 1.6 GB per 100M vectors)
  * where raw vectors never could. Search is asymmetric (ADC): the query
  * stays full precision, a per-query lookup table of subspace·centroid
  * dots turns each candidate's score into m table lookups, and exact
  * re-ranking of the PQ top-`rerank` candidates restores precision.
  */
object Pq {

  /** codebooks(s)(c) = centroid c of subspace s (dsub doubles each). */
  final case class Codebook(m: Int, ksub: Int, dsub: Int,
      centroids: Array[Array[Array[Double]]]) extends Serializable

  private def l2(a: Array[Double], aOff: Int, b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < b.length) { val d = a(aOff + i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Unit-normalized vectors as (vec_id, unit emb). */
  private def unitVecs(embeddings: DataFrame): org.apache.spark.sql.Dataset[Similarity.VecRow] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    Similarity.vecs(embeddings)
      .select(col("vec_id"), col("emb"), col("norm")).as[Similarity.VecRow]
      .map(r => Similarity.VecRow(r.vec_id,
        r.emb.map(_ / math.max(r.norm, 1e-12)), 1.0))
  }

  /** Train per-subspace L2 kmeans codebooks on a bounded deterministic
    * sample (first `trainLimit` rows by vec_id). None on empty input.
    */
  def train(embeddings: DataFrame, m: Int = 8, ksub: Int = 16,
      iters: Int = 8, trainLimit: Int = 1024): Option[Codebook] = {
    val sample = unitVecs(embeddings).orderBy(col("vec_id")).limit(trainLimit).collect()
    if (sample.isEmpty) return None
    val dim = sample(0).emb.length
    require(dim % m == 0, s"dim $dim must be divisible by m=$m")
    val dsub = dim / m
    val books = Array.tabulate(m) { s =>
      val off = s * dsub
      // deterministic init: spread over the sample
      var cents = Array.tabulate(ksub)(c =>
        sample((c.toLong * sample.length / ksub).toInt)
          .emb.slice(off, off + dsub))
      for (_ <- 0 until iters) {
        val sums = Array.fill(ksub)(new Array[Double](dsub))
        val counts = new Array[Int](ksub)
        sample.foreach { r =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < ksub) {
            val d = l2(r.emb, off, cents(c))
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          counts(best) += 1
          var j = 0
          while (j < dsub) { sums(best)(j) += r.emb(off + j); j += 1 }
        }
        cents = Array.tabulate(ksub)(c =>
          if (counts(c) > 0) sums(c).map(_ / counts(c)) else cents(c))
      }
      cents
    }
    Some(Codebook(m, ksub, dim / m, books))
  }

  /** Encode every vector to m bytes: (vec_id, code BINARY). */
  def encode(embeddings: DataFrame, cb: Codebook): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cb)
    unitVecs(embeddings).map { r =>
      val b = bc.value
      val code = new Array[Byte](b.m)
      var s = 0
      while (s < b.m) {
        val off = s * b.dsub
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < b.ksub) {
          val d = l2(r.emb, off, b.centroids(s)(c))
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        code(s) = best.toByte
        s += 1
      }
      (r.vec_id, code)
    }.toDF("vec_id", "code")
  }

  /** ADC top-k with exact re-rank: PQ-score the whole encoded corpus per
    * query (m lookups/candidate against a per-query LUT), take the best
    * `rerank`, re-rank those exactly. The broadcast is the ENCODED
    * corpus — the 32×-compressed index that fits where raw vectors
    * don't; the raw-vector join for re-ranking touches only
    * queries × rerank rows.
    */
  def pqTopK(embeddings: DataFrame, k: Int, m: Int = 8, ksub: Int = 16,
      rerank: Int = 32): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val cbOpt = train(embeddings, m, ksub)
    if (cbOpt.isEmpty)
      return Seq.empty[(Long, Long, Double, Int)].toDF("vec_id", "neighbor", "sim", "rn")
    val cb = cbOpt.get
    val bcCb = spark.sparkContext.broadcast(cb)
    val encoded = encode(embeddings, cb)
      .as[(Long, Array[Byte])].collect() // m+8 bytes per vector: the index
    val bcCodes = spark.sparkContext.broadcast(encoded)

    val candidates = unitVecs(embeddings).flatMap { q =>
      val b = bcCb.value
      // LUT(s)(c) = dot(q_s, centroid_{s,c}) → PQ score = Σ_s LUT(s)(code_s)
      val lut = Array.tabulate(b.m) { s =>
        val off = s * b.dsub
        Array.tabulate(b.ksub) { c =>
          var d = 0.0; var i = 0
          val cent = b.centroids(s)(c)
          while (i < cent.length) { d += q.emb(off + i) * cent(i); i += 1 }
          d
        }
      }
      val codes = bcCodes.value
      val best = new java.util.ArrayList[(Double, Long)](rerank + 1)
      var i = 0
      while (i < codes.length) {
        val (id, code) = codes(i)
        if (id != q.vec_id) {
          var score = 0.0; var s = 0
          while (s < b.m) { score += lut(s)(code(s) & 0xff); s += 1 }
          var pos = best.size()
          while (pos > 0 && best.get(pos - 1)._1 < score) pos -= 1
          if (pos < rerank) {
            best.add(pos, (score, id))
            if (best.size() > rerank) best.remove(rerank)
          }
        }
        i += 1
      }
      (0 until best.size()).map(r => (q.vec_id, best.get(r)._2))
    }.toDF("vec_id", "neighbor")

    // exact re-rank of the surviving candidates only
    val v = Similarity.vecs(embeddings)
    val q = v.select(col("vec_id"), col("emb").as("qe"), col("norm").as("qn"))
    val c = v.select(col("vec_id").as("neighbor"), col("emb").as("ce"),
      col("norm").as("cn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("sim").desc, col("neighbor"))
    candidates.join(q, "vec_id").join(c, "neighbor")
      .select(col("vec_id"), col("neighbor"),
        round(graft.functions.VectorOps.dotProduct(col("qe"), col("ce"))
          / (col("qn") * col("cn")), 6).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("vec_id"), col("neighbor"), col("sim"), col("rn"))
  }

  val queries: Map[String, Q] = Map(
    // L3d: PQ-compressed ANN — rows-only (codebooks are data-dependent);
    // PqSpec pins planted-duplicate recovery, code size, and recall.
    "l3d_pq_topk" -> ((s, d) => pqTopK(graft.Tables.embeddings(s, d), 3))
  )

  val oracles: Map[String, String] = Map.empty
}
