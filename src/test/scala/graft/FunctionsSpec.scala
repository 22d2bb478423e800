package graft

import graft.functions.{GeoMean, RollingHash}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Known-vector tests for the custom function surface (A9, fingerprint,
  * crc32 — the pieces the SQL oracle can't check).
  */
class FunctionsSpec extends AnyFunSuite with SparkTestBase {

  test("GeoMean aggregator: geomean(2,8)=4, partial-merge safe (A9)") {
    import spark.implicits._
    val df = Seq(("a", 2.0), ("a", 8.0), ("b", 3.0)).toDF("k", "x")
      .repartition(3) // force merge() across partitions
    val got = df.groupBy($"k").agg(round(GeoMean.column($"x"), 9).as("gm"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("a") === 4.0)
    assert(got("b") === 3.0)
  }

  test("RollingHash: known vector, computed independently") {
    import spark.implicits._
    val m = 1000000007L
    def tokHash(t: String): Long =
      t.getBytes("UTF-8").foldLeft(0L)((a, b) => (a * 131 + (b & 0xff)) % m)
    def roll(ts: Seq[String]): Long =
      ts.foldLeft(0L)((h, t) => (h * 31 + tokHash(t)) % m)
    val toks = Seq("the", "quick", "brown", "fox")
    val got = Seq(toks).toDF("toks")
      .select(RollingHash.rollingHash(col("toks")).as("h"))
      .head().getLong(0)
    assert(got === roll(toks))
  }

  test("RollingHash is order-sensitive and null-skipping") {
    import spark.implicits._
    def h(ts: Seq[String]) = Seq(ts).toDF("toks")
      .select(RollingHash.rollingHash(col("toks"))).head().getLong(0)
    assert(h(Seq("a", "b")) !== h(Seq("b", "a")))
    assert(h(Seq.empty[String]) === 0L)
    val withNull = Seq(Seq("a", null, "b")).toDF("toks")
      .select(RollingHash.rollingHash(col("toks"))).head().getLong(0)
    assert(withNull === h(Seq("a", "b")))
  }

  test("RollingHash interpreted eval matches codegen") {
    import spark.implicits._
    val toks = Seq("x", "yy", "zzz")
    val codegen = Seq(toks).toDF("toks")
      .select(RollingHash.rollingHash(col("toks"))).head().getLong(0)
    val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      toks.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray)
    val evaled = RollingHash(
      org.apache.spark.sql.graftbridge.ColumnBridge.expression(lit(1)))
      .nullSafeEval(arr)
    assert(codegen === evaled.asInstanceOf[Long])
  }

  test("NormalizeNfc: composes decomposed forms, ASCII is an identity fixpoint") {
    import spark.implicits._
    import graft.functions.NormalizeNfc
    import org.apache.spark.unsafe.types.UTF8String
    // decomposed e+U+0301 composes to é (one char); Å likewise
    val got = Seq("cafe\u0301 A\u030A").toDF("s")
      .select(NormalizeNfc.normalizeNfc(col("s")).as("n"),
        length(NormalizeNfc.normalizeNfc(col("s"))).as("len"))
      .head()
    assert(got.getString(0) === "caf\u00e9 \u00c5")
    assert(got.getInt(1) === 6)
    // already-NFC and pure-ASCII inputs return the INPUT object (the
    // zero-allocation fast path), and the helper is idempotent
    val ascii = UTF8String.fromString("plain ascii text")
    assert(NormalizeNfc.nfc(ascii) eq ascii)
    val composed = UTF8String.fromString("caf\u00e9")
    assert(NormalizeNfc.nfc(composed) eq composed)
    val once = NormalizeNfc.nfc(UTF8String.fromString("e\u0301"))
    assert(NormalizeNfc.nfc(once) eq once)
    // SQL-name path through the session registry
    graft.GraftExtensions.ensureFunctions(spark)
    // NB Spark's char(n) wraps at 256 (chr(n % 256)) — the combining
    // mark must come in as a unicode escape in the SQL text itself
    val viaSql = spark.sql(
      "SELECT normalize_nfc('cafe\\u0301') AS n").head().getString(0)
    assert(viaSql === "caf\u00e9")
  }

  test("ShingleHash: distinct-set size matches the string-shingle form") {
    import spark.implicits._
    import graft.functions.ShingleHash
    // string-form reference: distinct "t1 t2 t3" windows
    def refCount(toks: Seq[String]): Int =
      if (toks.length < 3) 0
      else toks.sliding(3).map(_.mkString(" ")).toSeq.distinct.size
    val cases = Seq(
      Seq("a", "b", "c", "d", "e"),              // all distinct
      Seq("a", "b", "a", "b", "a", "b"),         // heavy repeats: 2 distinct
      Seq("x", "y"),                             // under 3 tokens -> empty
      Seq("w", "w", "w", "w"),                   // single repeated window
      Seq("t1", "t2", "t3", "t1", "t2", "t3", "t1"))
    for (c <- cases) {
      val got = Seq(c).toDF("toks")
        .select(ShingleHash.shingleHashes(col("toks")).as("hs"))
        .head().getSeq[Long](0)
      assert(got.length === refCount(c), s"case $c")
      assert(got.distinct.length === got.length, s"dupes in $c")
      assert(got === got.sorted, s"not canonical order in $c")
    }
  }

  test("NGramHash: every occurrence kept in order; sort∘dedup at k=3 == ShingleHash") {
    import spark.implicits._
    import graft.functions.ShingleHash
    val cases = Seq(
      Seq("a", "b", "c", "d", "e"),
      Seq("a", "b", "a", "b", "a", "b"),   // repeated windows must ALL appear
      Seq("x", "y"),                        // under k -> empty
      Seq("w", "w", "w", "w"),
      Seq("t1", "t2", "t3", "t1", "t2", "t3", "t1"))
    for (c <- cases; k <- Seq(1, 3, 5)) {
      val got = Seq(c).toDF("toks")
        .select(ShingleHash.ngramHashes(col("toks"), k).as("hs"))
        .head().getSeq[Long](0)
      val expectN = math.max(c.length - k + 1, 0)
      assert(got.length === expectN, s"case $c k=$k")
      // equal windows hash equal; distinct windows hash distinct (no
      // collision on these tiny vocabularies)
      val wins = if (c.length < k) Seq.empty[String]
                 else c.sliding(k).map(_.mkString(" ")).toSeq
      assert(wins.zip(got).groupBy(_._1).values
        .forall(g => g.map(_._2).distinct.size == 1), s"case $c k=$k: not a function")
      assert(got.distinct.length === wins.distinct.length, s"case $c k=$k: collision")
      if (k == 3) {
        val shingle = Seq(c).toDF("toks")
          .select(ShingleHash.shingleHashes(col("toks")).as("hs"))
          .head().getSeq[Long](0)
        assert(got.distinct.sorted === shingle, s"case $c: k=3 chain differs")
      }
    }
  }

  test("NGramHash: interpreted eval matches codegen path") {
    import spark.implicits._
    import graft.functions.ShingleHash
    val toks = Seq("alpha", "beta", "gamma", "beta", "alpha")
    val codegen = Seq(toks).toDF("toks")
      .select(ShingleHash.ngramHashes(col("toks"), 2)).head().getSeq[Long](0)
    val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      toks.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray)
    val evaled = graft.functions.NGramHash(
      org.apache.spark.sql.graftbridge.ColumnBridge.expression(lit(1)), 2)
      .nullSafeEval(arr).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(codegen === evaled.toLongArray().toSeq)
  }

  test("ShingleHash: interpreted eval matches codegen path") {
    import spark.implicits._
    import graft.functions.ShingleHash
    val toks = Seq("alpha", "beta", "gamma", "beta", "alpha")
    val codegen = Seq(toks).toDF("toks")
      .select(ShingleHash.shingleHashes(col("toks"))).head().getSeq[Long](0)
    val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      toks.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray)
    val evaled = graft.functions.ShingleHash(
      org.apache.spark.sql.graftbridge.ColumnBridge.expression(lit(1)))
      .nullSafeEval(arr).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(codegen === evaled.toLongArray().toSeq)
  }

  test("IntersectCount ≡ size(array_intersect) on distinct sets, any input order") {
    import spark.implicits._
    import graft.functions.TokenHashKernels
    val rnd = new scala.util.Random(7)
    val cases = (1 to 20).map { _ =>
      val universe = (1 to 40).map(_ => rnd.nextLong() % 50).distinct
      val a = rnd.shuffle(universe).take(rnd.nextInt(universe.size + 1))
      val b = rnd.shuffle(universe).take(rnd.nextInt(universe.size + 1))
      (a, b)
    } :+ ((Seq.empty[Long], Seq(1L, 2L))) :+ ((Seq(3L), Seq.empty[Long]))
    val df = cases.toDF("a", "b")
    val got = df.select(
      TokenHashKernels.intersectCount(col("a"), col("b")).as("k"),
      size(array_intersect(col("a"), col("b"))).as("ref")).collect()
    got.foreach(r => assert(r.getInt(0) === r.getInt(1), r.toString))
  }

  test("crc32/hash built-ins: known vectors (F9 non-oracle part)") {
    import spark.implicits._
    val r = Seq("hello").toDF("s").select(
      crc32(col("s").cast("binary")).as("c"),
      md5(col("s").cast("binary")).as("m")).head()
    assert(r.getLong(0) === 907060870L) // public CRC-32 of "hello"
    assert(r.getString(1) === "5d41402abc4b2a76b9719d911017c592")
  }

  test("ChunkSpans UDTF ≡ the sequence+posexplode composition (F19 law)") {
    // the generator must emit exactly what the built-in composition it
    // replaces emits — same chunk boundaries, order, and tail handling
    val docs = Tables.documents(spark, sf("sf0.001"))
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    graft.GraftExtensions.ensureFunctions(spark)
    docs.createOrReplaceTempView("fspec_docs")
    val viaUdtf = spark.sql(
      """SELECT doc_id, chunk_idx, chunk FROM fspec_docs
        |LATERAL VIEW chunk_spans(t, 30, 24) AS chunk_idx, chunk""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val viaCompose = docs
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0),
          ceil(size(col("t")).cast("double") / 24).cast("int") - 1),
        i => concat_ws(" ", slice(col("t"), i * 24 + 1, lit(30))))))
      .select(col("doc_id"), col("pos").cast("long"), col("col"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(viaUdtf === viaCompose)
    assert(viaUdtf.nonEmpty)
  }

  test("ChunkSpans edges: null and empty arrays generate no rows; tail is short") {
    import spark.implicits._
    graft.GraftExtensions.ensureFunctions(spark)
    Seq(
      (1L, Some(Seq("a", "b", "c", "d", "e"))),
      (2L, Some(Seq.empty[String])),
      (3L, None)
    ).toDF("id", "t").createOrReplaceTempView("fspec_edge")
    val rows = spark.sql(
      """SELECT id, chunk_idx, chunk FROM fspec_edge
        |LATERAL VIEW chunk_spans(t, 3, 2) AS chunk_idx, chunk""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    // id=1, len 5, stride 2 → ceil(5/2)=3 chunks; last starts at 4, one token
    assert(rows === Set(
      (1L, 0L, "a b c"), (1L, 1L, "c d e"), (1L, 2L, "e")))
  }

  test("w15 EWMA fold arms: seed arm fires once, running arm folds the tail (hand vectors)") {
    // the ONE BranchAudit skip left in r16: the fold's CASE consults the
    // RUNNING accumulator (acc IS NULL), which no element-domain probe
    // can replay — so this spec owns both arms with paper-computable
    // vectors through the w15 entry's exact expression text
    import spark.implicits._
    val ewmaSql =
      """aggregate(series, CAST(NULL AS DOUBLE),
        |  (acc, x) -> CASE WHEN acc IS NULL THEN x.value
        |              ELSE 0.2 * x.value + 0.8 * acc END)""".stripMargin
    def ewma(vals: Double*): Double = Seq(vals)
      .toDF("v")
      .select(org.apache.spark.sql.functions.expr(
        "transform(v, x -> named_struct('value', x))").as("series"))
      .select(org.apache.spark.sql.functions.expr(ewmaSql).as("e"))
      .head().getDouble(0)
    // single element: ONLY the seed (acc IS NULL) arm fires
    assert(math.abs(ewma(10.0) - 10.0) < 1e-12)
    // longer series: seed fires exactly once, the running arm folds —
    // 0.2*20 + 0.8*10 = 12; 0.2*30 + 0.8*12 = 15.6
    assert(math.abs(ewma(10.0, 20.0, 30.0) - 15.6) < 1e-12)
    // the running arm sees the accumulator, not the previous element:
    // 0.2*5 + 0.8*12 = 10.6 (a previous-element mis-read gives 8.2... wrong fold)
    assert(math.abs(ewma(10.0, 20.0, 5.0) - 10.6) < 1e-12)
  }
}
