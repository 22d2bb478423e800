package graft.operators

import graft.Tables
import graft.Tables.Q
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding VOCABULARY TRAINING (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units" — the
  * merge-learning loop every LLM tokenizer family descends from),
  * expressed as distributed DataFrame iterations.
  *
  * BPE trains on the WORD-FREQUENCY table, not the corpus: the corpus
  * collapses to (distinct word, count) once — the only pass that ever
  * touches raw text — and every merge round runs over that table
  * (~10⁷–10⁸ rows for a 100 TB web corpus; the fixture's synthetic
  * vocabulary is small but the shapes are identical). Each round is:
  *
  *   1. adjacent-pair counts: one explode over the current symbol
  *      sequences + one partial-agg shuffle keyed by pair, freq-weighted;
  *   2. argmax pair: a bounded driver collect of exactly ONE row
  *      (count desc, then lexicographic — fully deterministic);
  *   3. merge application: a narrow typed map fusing that pair
  *      greedily left-to-right in every word, then an eager
  *      localCheckpoint so iteration k never re-executes 1..k−1
  *      (the m36 Pregel contract; a 32k-vocab production run is
  *      thousands of rounds and would otherwise be O(rounds²)).
  *
  * A production trainer batches several DISJOINT top pairs per round to
  * cut the shuffle count; the per-round structure is unchanged.
  *
  * The learned merge table is data-dependent and iterative, so the l28
  * entry is rows-only: BpeSpec owns semantics (hand-verifiable merges on
  * a planted corpus + invariants), and the hashed twin l28b pins the
  * round-1 pair statistics cross-engine — the same tokenization
  * (`split(text, ' ')`, the l5/l15 convention), char+`</w>` symbol
  * initialization, and freq-weighted adjacent-pair count that every
  * later round reuses.
  */
object Bpe {

  /** Greedy left-to-right fuse of adjacent (l, r) into l+r — the BPE
    * merge application (non-overlapping: "aaa" under (a,a) → ["aa","a"]).
    */
  private[graft] def fuse(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toSeq
  }

  /** Word-frequency table with initial symbol sequences: characters
    * plus the `</w>` end-of-word marker (so merges can't cross word
    * boundaries and final merges learn whole-word units).
    */
  private def initialSeqs(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(concat(
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"),
        array(lit("</w>"))).as("syms"), col("freq"))

  /** Freq-weighted adjacent-pair counts over the current sequences —
    * the per-round statistics (and the l28b hashed surface for round 1).
    */
  private def pairCounts(seqs: DataFrame): DataFrame =
    seqs.select(col("freq"), explode(expr(
        """transform(slice(syms, 1, size(syms) - 1),
          |  (x, i) -> struct(x AS l, element_at(syms, i + 2) AS r))"""
          .stripMargin)).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("cnt"))

  /** Train `rounds` merges; returns the ordered merge table
    * (rank, left, right, pair_count) — the tokenizer artifact.
    */
  def train(docs: DataFrame, rounds: Int = 10): DataFrame =
    trainFromSeqs(initialSeqs(docs), rounds)

  /** The merge loop over an explicit word-frequency table — factored so
    * l28c can hash-check the loop on a bounded word slice against the
    * DuckDB unrolled-round oracle, and so JobLinearitySpec can assert
    * the per-round job count is constant in the round index.
    */
  private[graft] def trainFromSeqs(seqs0: DataFrame, rounds: Int): DataFrame = {
    val spark = seqs0.sparkSession
    import spark.implicits._
    var seqs = seqs0
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var done = false
    for (round <- 1 to rounds if !done) {
      val top = pairCounts(seqs)
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect() // bounded by construction: one row
      if (top.isEmpty) done = true // vocabulary fully merged
      else {
        val (l, r, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((round, l, r, cnt))
        seqs = seqs.as[(Seq[String], Long)]
          .map { case (s, f) => (fuse(s, l, r), f) }
          .toDF("syms", "freq")
          .localCheckpoint(true)
      }
    }
    merges.toSeq.toDF("rank", "left", "right", "pair_count")
  }

  /** The ENCODE half of the tokenizer (l29): apply an ordered merge
    * list to each word's symbol sequence with the production [[fuse]]
    * kernel. Processing merges in ASCENDING RANK, each fused to
    * exhaustion, equals the textbook lowest-rank-pair-first loop
    * (Sennrich 2016): a pair containing a learned symbol can only be
    * merged by a rule learned AFTER the rule that minted that symbol,
    * so its rank is strictly higher — no lower-rank pair can ever
    * reappear once its rank has been processed (BpeSpec pins the law on
    * adversarial merge chains). One typed map per word — scan-local,
    * zero shuffle beyond the word-frequency aggregate, which is the
    * only honest shape for encoding a 100 TB corpus; the merge table
    * rides in the task closure (vocabulary-sized, i.e. tiny).
    */
  private[graft] def encodeWords(wordFreqs: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = wordFreqs.sparkSession
    import spark.implicits._
    wordFreqs.select(col("w"), concat(
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"),
        array(lit("</w>"))).as("syms"), col("freq"))
      .as[(String, Seq[String], Long)]
      .map { case (w, sy, f) =>
        (w, merges.foldLeft(sy) { case (s2, (l, r)) => fuse(s2, l, r) }, f)
      }
      .toDF("w", "syms", "freq")
  }

  val queries: Map[String, Q] = Map(
    // L28: the trainer — rows-only (iterative, data-dependent); BpeSpec
    // owns semantics, l28b is the hashed statistics twin
    "l28_bpe_train" -> ((s, d) => train(Tables.documents(s, d), 10)),

    // L29 (r16): BPE ENCODE — the APPLY half a training pipeline
    // actually runs over the corpus (l28 trains once; encode touches
    // every byte). Three merges train on the bounded 3–6-char word
    // slice (the l28c corpus), then every word of the slice is encoded
    // by applying them in rank order; the oracle reuses l28c's
    // unrolled per-round recursion — its post-round-3 state IS the
    // encoded word set — so greedy order, overlap handling, AND the
    // final token sequences are cross-engine-pinned. Output is
    // word-level (encoded form + token count + corpus frequency): the
    // strongest hash of the apply kernel itself.
    "l29_bpe_encode" -> ((s, d) => {
      val wf = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")).between(3, 6))
        .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      val seqs = wf.select(concat(
          expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"),
          array(lit("</w>"))).as("syms"), col("freq"))
      // rounds-bounded driver collect (3 rows) — the merge TABLE is the
      // tokenizer artifact and is always vocabulary-sized
      val merges = trainFromSeqs(seqs, 3).collect()
        .sortBy(_.getInt(0))
        .map(r => (r.getString(1), r.getString(2))).toSeq
      encodeWords(wf, merges)
        .select(col("w"),
          array_join(col("syms"), " ").as("encoded"),
          size(col("syms")).cast(org.apache.spark.sql.types.LongType)
            .as("n_tokens"),
          col("freq"))
    }),

    // L28b: round-1 pair statistics, hash-checked — the exact
    // tokenization/initialization/weighted-count kernel every training
    // round reuses, recomputed independently by DuckDB; top-20 under a
    // total order (cnt desc, pair lexicographic)
    "l28b_bpe_pairs" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("cnt").desc, col("l"), col("r"))
      pairCounts(initialSeqs(Tables.documents(s, d)))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 20)
        .select(col("rank"), col("l"), col("r"), col("cnt"))
    }),

    // L28c (r15): the MERGE LOOP ITSELF hash-checked beyond round 1
    // (VERDICT r14 missing #4): three full training rounds — greedy
    // argmax under the (cnt desc, l, r) total order, non-overlapping
    // left-to-right fuse, recount — over the bounded word slice
    // (3 ≤ len ≤ 6), recomputed independently by DuckDB with the
    // fuse expressed as an unrolled per-round recursive CTE (the l20
    // unrolling precedent). Greedy-fuse order, overlap handling, and
    // the re-counted pair statistics are all cross-engine-pinned; a
    // slice keeps the oracle's per-position recursion bounded while
    // the Spark side runs the production kernel unchanged.
    "l28c_bpe_merge_rounds" -> ((s, d) => {
      val seqs = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")).between(3, 6))
        .groupBy(col("w")).agg(count(lit(1)).as("freq"))
        .select(concat(
          expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"),
          array(lit("</w>"))).as("syms"), col("freq"))
      trainFromSeqs(seqs, 3)
        .select(col("rank"), col("left").as("l"), col("right").as("r"),
          col("pair_count").as("cnt"))
    })
  )

  /** The l28c/l29 shared oracle prefix: word-frequency init over the
    * bounded slice plus `n` unrolled merge rounds — after round k,
    * `b$k` holds the round's argmax merge and `s$k` the re-fused word
    * set, so `s$n` is simultaneously the trainer's final state and the
    * ENCODING of every word under the n-merge table.
    */
  private def mergeRoundsCte(n: Int): String = {
    val rounds = (1 to n).map { k =>
      val prev = s"s${k - 1}"
      s"""p$k AS (
         |  SELECT pr[1] AS l, pr[2] AS r, CAST(SUM(freq) AS BIGINT) AS cnt
         |  FROM (SELECT unnest(list_zip(syms[1:len(syms) - 1],
         |                               syms[2:len(syms)])) AS pr, freq
         |        FROM $prev)
         |  GROUP BY 1, 2
         |), b$k AS (
         |  SELECT l, r, cnt FROM p$k ORDER BY cnt DESC, l, r LIMIT 1
         |), f$k AS (
         |  SELECT w, syms, freq, 0 AS pos, CAST([] AS VARCHAR[]) AS acc
         |  FROM $prev
         |  UNION ALL
         |  SELECT f.w, f.syms, f.freq,
         |    CASE WHEN f.pos + 1 < len(f.syms) AND f.syms[f.pos + 1] = b.l
         |              AND f.syms[f.pos + 2] = b.r
         |         THEN f.pos + 2 ELSE f.pos + 1 END,
         |    CASE WHEN f.pos + 1 < len(f.syms) AND f.syms[f.pos + 1] = b.l
         |              AND f.syms[f.pos + 2] = b.r
         |         THEN list_append(f.acc, b.l || b.r)
         |         ELSE list_append(f.acc, f.syms[f.pos + 1]) END
         |  FROM f$k f, b$k b WHERE f.pos < len(f.syms)
         |), s$k AS (
         |  SELECT w, acc AS syms, freq FROM f$k WHERE pos = len(syms)
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH RECURSIVE wf AS (
       |  SELECT w, COUNT(*) AS freq FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE length(w) BETWEEN 3 AND 6 GROUP BY w
       |), s0 AS (
       |  SELECT w, list_append(
       |    list_transform(generate_series(1, length(w)),
       |      i -> substring(w, i, 1)), '</w>') AS syms, freq
       |  FROM wf
       |), $rounds""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // l29: the post-round-3 word set read out as token sequences — the
    // identical recursion l28c pins, so encode correctness rides the
    // already-proven fuse/argmax machinery
    "l29_bpe_encode" ->
      s"""${mergeRoundsCte(3)}
         |SELECT w, array_to_string(syms, ' ') AS encoded,
         |  CAST(len(syms) AS BIGINT) AS n_tokens,
         |  CAST(freq AS BIGINT) AS freq
         |FROM s3""".stripMargin,

    "l28b_bpe_pairs" ->
      """WITH wf AS (
        |  SELECT w, COUNT(*) AS freq FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE length(w) > 0 GROUP BY w
        |), s AS (
        |  SELECT list_append(
        |    list_transform(generate_series(1, length(w)),
        |      i -> substring(w, i, 1)), '</w>') AS syms, freq
        |  FROM wf
        |), p AS (
        |  SELECT unnest(list_zip(syms[1:length(syms) - 1],
        |                         syms[2:length(syms)])) AS pr, freq
        |  FROM s
        |), c AS (
        |  SELECT pr[1] AS l, pr[2] AS r,
        |    CAST(SUM(freq) AS BIGINT) AS cnt
        |  FROM p GROUP BY 1, 2
        |)
        |SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, l, r) AS INT)
        |    AS rank, l, r, cnt
        |FROM c ORDER BY cnt DESC, l, r LIMIT 20""".stripMargin,

    // l28c: three merge rounds unrolled — per round: pair recount
    // (p_k), argmax under the (cnt desc, l, r) total order (b_k), and
    // the greedy NON-OVERLAPPING left-to-right fuse as a positional
    // recursive CTE (f_k: one step per consumed symbol, jumping two on
    // a fuse — exactly the kernel's while-loop). The round blocks are
    // generated, not transcribed, so round k cannot silently diverge.
    "l28c_bpe_merge_rounds" ->
      s"""${mergeRoundsCte(3)}
         |SELECT CAST(1 AS INT) AS rank, l, r, cnt FROM b1
         |UNION ALL SELECT CAST(2 AS INT), l, r, cnt FROM b2
         |UNION ALL SELECT CAST(3 AS INT), l, r, cnt FROM b3""".stripMargin
  )
}
