package graft

import java.util.Locale
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query timed at
  * SPARK_GRAFT_SF_DIR, one JSON line on stdout (BENCH_r{N}.json).
  *
  * Protocol (BASELINE.md §4): full-inventory warmup at the measured sf,
  * then each query timed as the MEDIAN of up to `SPARK_GRAFT_BENCH_RUNS`
  * (default 3) passes — as many as fit the deadline. Medians, not single
  * shots: rounds 1 and 2 showed one-off system contention inflating
  * individual passes by 0.5–2.5 s, which a median absorbs. System load
  * averages are captured before and after so a contended run is visible
  * in the artifact itself.
  *
  * Each query is forced through a noop-format write so every output
  * column is fully materialized (a bare .count() would let Spark skip
  * column decoding on projection-only plans — flattering but dishonest).
  *
  * Output contract — hardened after three rounds of unparseable driver
  * artifacts (r1/r2: 2000-char stdout-tail truncation of a ~3.5k line;
  * r3: rc=124 wall-clock timeout killed the JVM before the single final
  * println). Three defenses, in order of importance:
  *
  *  1. DEADLINE-ADAPTIVE PASSES. `SPARK_GRAFT_BENCH_DEADLINE` (seconds
  *     of budget from main() entry, default 390 — conservative under the
  *     driver's observed ~600 s wall clock, which also pays sbt compile
  *     and JVM/Spark startup before main) bounds the run. After warmup,
  *     timed passes are added only while the projected cost of the next
  *     pass (1.3× the slowest pass so far, + 15 s slack) fits. A pass in
  *     progress is aborted (discarded) if the deadline approaches, so
  *     the run always ENDS CLEANLY with rc=0 instead of being killed.
  *  2. A COMPACT LINE AFTER EVERY PASS. The driver keeps only the last
  *     2000 chars of stdout, so the line uses the unique id prefix of
  *     each query name (`l2c_shingle_jaccard` → `l2c`; RegistrySpec pins
  *     prefix uniqueness) and 3-decimal seconds (~1.5k chars). It is
  *     printed with medians-so-far after the warmup and after every
  *     completed timed pass — whatever line is last when the process
  *     ends is a valid, parseable artifact. The warmup-only line is
  *     marked `"runs":0` (first-touch inflated, better than nothing).
  *  3. A JVM SHUTDOWN HOOK re-emits the latest line if the process is
  *     torn down (SIGTERM from `timeout`) before the clean exit —
  *     registered BEFORE the SparkSession exists so it runs after
  *     Spark's own stop hook without depending on it.
  *
  * The full-name, full-precision, per-pass record is rewritten after
  * every pass to bench_full_latest.json (gitignored scratch) — NOT to
  * the committed bench_full.json, which a driver-initiated run at an
  * arbitrary load/SF used to clobber silently (VERDICT r4 item 1). A
  * run that is meant to become the committed record sets
  * SPARK_GRAFT_BENCH_RECORD=bench_full.json explicitly.
  *
  * Diagnostic-only queries (SparkEntry.benchOptIn — currently m8's
  * exact-distinct profile, whose Expand ×4 is the documented price of
  * exactness) are skipped unless SPARK_GRAFT_BENCH_ALL=1.
  *
  * CONTAMINATION EVIDENCE (VERDICT r10 next #1): the pre-pass load
  * gate cannot see a co-tenant burst that starts MID-pass — BENCH_r10
  * recorded gate waits at load 1.95 yet five adjacent queries came out
  * 4–8× inflated by a burst the artifact couldn't attribute. The 1-min
  * load average is useless DURING a pass (it is dominated by our own
  * local[32] work), so every timed query is stamped with the EXTERNAL CPU
  * it ran alongside: /proc/stat busy jiffies minus this JVM's process
  * CPU time, over the query's wall interval, in cores — a direct
  * measurement of co-tenant CPU inside the timing window. A
  * measurement is CLEAN when external CPU ≤ SPARK_GRAFT_BENCH_EXT_MAX
  * (default 2.0 cores); per-query medians use clean passes only, any
  * query left with NO clean measurement is re-timed once after a fresh
  * load gate (budget permitting), and queries still unclean are listed
  * under "hot" in the stdout tail JSON so the driver can mechanically
  * discount them instead of reading contention as regression. The full
  * record carries every pass's per-query ext stamps.
  */
object Bench {
  // latest parseable compact line; the shutdown hook replays it if the
  // normal path never got to print a final one
  @volatile private var lastLine: String = ""
  // short aggregates-only line printed AFTER the compact line: at ~190
  // queries the compact line (~2.3 kB) outgrew the driver's 2000-char
  // stdout tail (BENCH_r11 parsed=null, the r1/r2 failure at the new
  // inventory size). Tail truncation keeps the END of stdout, so a
  // ≤300-char summary printed LAST always survives at any inventory
  // size; per-query detail lives in the full record file.
  @volatile private var shortLine: String = ""
  @volatile private var cleanExit: Boolean = false

  private def f3(d: Double): String = String.format(Locale.ROOT, "%.3f", d)

  /** One timed measurement: wall seconds (-1 on failure) and the
    * external-CPU stamp (cores of non-JVM busy CPU during the window).
    */
  private case class M(sec: Double, ext: Double)

  private val osBean =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => Some(b)
      case _ => None
    }

  /** Whole-system busy jiffies from /proc/stat (USER_HZ = 100 on every
    * mainstream Linux); -1 when unreadable (ext stamps then read 0 and
    * nothing is ever flagged — fail open, the r10 behavior).
    */
  private def busyJiffies(): Long = try {
    val src = scala.io.Source.fromFile("/proc/stat")
    try {
      val f = src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
      // user + nice + system + irq + softirq + steal (idle/iowait excluded)
      f(0) + f(1) + f(2) + f(5) + f(6) + (if (f.length > 7) f(7) else 0L)
    } finally src.close()
  } catch { case _: Throwable => -1L }

  def main(args: Array[String]): Unit = {
    val t0 = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - t0) / 1e9
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val maxPasses = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val deadline = sys.env.getOrElse("SPARK_GRAFT_BENCH_DEADLINE", "390").toDouble
    def remaining: Double = deadline - elapsed

    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      if (!cleanExit && lastLine.nonEmpty) {
        println(lastLine)
        if (shortLine.nonEmpty) println(shortLine)
        System.out.flush()
      }
    }))

    val spark = Tuning(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def loadAvg: Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage

    val extMax = sys.env.getOrElse("SPARK_GRAFT_BENCH_EXT_MAX", "2.0").toDouble
    def once(name: String): M = {
      val j0 = busyJiffies()
      val c0 = osBean.map(_.getProcessCpuTime).getOrElse(0L)
      val t = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return M(-1.0, 0.0)
      }
      val wall = (System.nanoTime() - t) / 1e9
      val j1 = busyJiffies()
      val c1 = osBean.map(_.getProcessCpuTime).getOrElse(0L)
      val ext =
        if (j0 < 0 || j1 < 0 || osBean.isEmpty || wall <= 0) 0.0
        else math.max(0.0, (j1 - j0) / 100.0 - (c1 - c0) / 1e9) / wall
      M(wall, ext)
    }

    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_RECORD", "bench_full_latest.json")
    val all = sys.env.get("SPARK_GRAFT_BENCH_ALL").contains("1")
    val names = SparkEntry.queries.keys.toSeq
      .filter(n => all || !SparkEntry.benchOptIn(n)).sorted

    // Load gate, ALL runs (VERDICT r8 missing #3; widened r10 next #6 —
    // BENCH_r09 was captured at load 8.46 because the driver's run path
    // bypassed the record-only gate, and its sql1/m5/m7 readings were
    // contention noise the driver can't tell from regressions). Before
    // warmup and before each timed pass, wait until the 1-min load
    // average drops under SPARK_GRAFT_BENCH_LOAD_MAX (default 2.0),
    // bounded per gate and by the global deadline; every gate event is
    // recorded in bench_full.json AND the stdout tail JSON, so a
    // still-contended artifact is self-describing.
    val loadMax = sys.env.getOrElse("SPARK_GRAFT_BENCH_LOAD_MAX", "2.0").toDouble
    val gateEvents = scala.collection.mutable.ArrayBuffer.empty[String]
    def loadGate(tag: String): Unit = {
      var waited = 0
      while (loadAvg > loadMax && waited < 120 && remaining > 60) {
        Thread.sleep(5000); waited += 5
      }
      gateEvents +=
        s"""{"at":"$tag","load":${f3(loadAvg)},"waited_s":$waited}"""
    }
    val loadBefore = loadAvg

    // lower median: for an even run count this takes the faster middle
    // value (ok(size/2) would take the slower — with 2 passes that's a
    // max, penalizing one contention burst)
    def median(xs: Seq[Double]): Double = {
      val ok = xs.filter(_ >= 0).sorted
      if (ok.isEmpty) -1.0 else ok((ok.size - 1) / 2)
    }

    // committed-record baseline captured ONCE, before any pass: a
    // record run rewrites bench_full.json after every pass, so a lazy
    // read would compare the run against its own previous pass (the
    // r14 attempt-1 bug — live_over_rec degenerated to ~1.0)
    val recBase: Option[(Double, Int, Map[String, Double])] = try {
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("bench_full.json")),
        java.nio.charset.StandardCharsets.UTF_8)
      if (!txt.contains("\"sf\":\"" + sfDir + "\"")) None
      else for {
        rTotal <- """"value":([0-9.]+)""".r.findFirstMatchIn(txt)
          .map(_.group(1).toDouble)
        rRuns <- """"runs":(\d+)""".r.findFirstMatchIn(txt)
          .map(_.group(1).toInt)
        qb <- """"queries":\{(.*?)\}""".r.findFirstMatchIn(txt)
          .map(_.group(1))
      } yield (rTotal, rRuns,
        """"([A-Za-z0-9_]+)":(-?[0-9.]+)""".r.findAllMatchIn(qb)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap)
    } catch { case _: Throwable => None }

    // per-query value: median over the CLEAN measurements (ext ≤ extMax,
    // retime included); a query with successes but zero clean ones falls
    // back to the all-measurements median and is listed under "hot"
    def emit(perPass: Seq[Map[String, M]], runs: Int,
        retimed: Map[String, M] = Map.empty): Unit = {
      val med = names.map { n =>
        val ms = perPass.map(_(n)) ++ retimed.get(n)
        val clean = ms.filter(m => m.sec >= 0 && m.ext <= extMax)
        val value =
          if (runs == 0 || clean.nonEmpty) median(
            (if (runs == 0) ms else clean).map(_.sec))
          else median(ms.map(_.sec))
        val hot = runs > 0 && clean.isEmpty && ms.exists(_.sec >= 0)
        (n, value, hot)
      }
      val total = med.map(_._2).filter(_ >= 0).sum
      // VERDICT r15 item 8: the externally graded streaming-machinery
      // entries (t22+, multi-batch feeds + state stores) are the gate-
      // excluded class and keep growing — split their wall-clock out so
      // the driver's tail carries BOTH totals alongside per-query keys
      def isStreamMachinery(n: String): Boolean = {
        val p = n.takeWhile(_ != '_')
        p.length > 1 && p.head == 't' && p.tail.forall(_.isDigit) &&
          p.tail.toInt >= 22
      }
      val streamTotal =
        med.collect { case (n, v, _) if v >= 0 && isStreamMachinery(n) => v }.sum
      val qs = med.map { case (k, v, _) => "\"" + k.takeWhile(_ != '_') + "\":" + f3(v) }
        .mkString("{", ",", "}")
      // compact line caps the hot list at 24 ids (the realistic case is
      // a handful; an all-hot run must not blow the driver's 2000-char
      // stdout tail — the full record carries the complete list)
      val hotAll = med.filter(_._3)
      val hotIds = (hotAll.take(24).map(m => "\"" + m._1.takeWhile(_ != '_') + "\"") ++
        (if (hotAll.size > 24) Seq("\"+" + (hotAll.size - 24) + "\"") else Nil))
        .mkString("[", ",", "]")
      lastLine =
        s"""{"metric":"total","value":${f3(total)},"unit":"sec","runs":$runs,""" +
        s""""load_avg":[${f3(loadBefore)},${f3(loadAvg)}],""" +
        s""""hot":$hotIds,""" +
        s""""load_gate":${gateEvents.mkString("[", ",", "]")},""" +
        s""""queries":$qs,"sf":"$sfDir"}"""
      println(lastLine)
      // FULL-INVENTORY line printed LAST, sized for the driver's
      // 2000-char stdout tail (r12 verdict missing #5: only 6 of 203
      // medians survived the tail; the 3-decimal compact line outgrew it
      // at ~190 queries). Medians ride as INTEGER CENTISECONDS
      // ("q_unit":"cs") — ~1.75 kB at 208 queries vs 2.4 kB at 3dp —
      // with a decisecond fallback and, past that, the old 6-query
      // headline, so the last line is ALWAYS parseable whole. Full
      // 3-decimal per-query detail stays in the record file.
      val extPeak = perPass.flatMap(_.values.map(_.ext)).foldLeft(0.0)(math.max)
      // EMBEDDED CLEAN SERIES (r14 item 8): when the live window is
      // contaminated (runs=0 / ext-hot), the artifact still carries one
      // clean reference — the committed stamped-quiet record's headline
      // plus the live/record ratio over the COMMON query set, so the
      // judge can discount co-tenancy mechanically from the tail alone.
      val rec: String = recBase.map { case (rTotal, rRuns, recMed) =>
        val common = med.collect {
          case (n, v, _) if v >= 0 && recMed.get(n).exists(_ > 0) =>
            (v, recMed(n))
        }
        val ratio = if (common.isEmpty) -1.0
          else common.map(_._1).sum / common.map(_._2).sum
        s""""rec":{"total":${f3(rTotal)},"runs":$rRuns,""" +
          s""""common_n":${common.size},"live_over_rec":${f3(ratio)}},"""
      }.getOrElse("")
      def tail(unit: String, scale: Double): String = {
        val qs = med.map { case (k, v, _) =>
          "\"" + k.takeWhile(_ != '_') + "\":" +
            (if (v >= 0) math.round(v * scale).toString else "-1")
        }.mkString("{", ",", "}")
        s"""{"metric":"total","value":${f3(total)},"unit":"sec","runs":$runs,""" +
        s""""stream_total":${f3(streamTotal)},"gate_total":${f3(total - streamTotal)},""" +
        s""""n":${med.count(_._2 >= 0)},"ext_peak":${f3(extPeak)},$rec""" +
        s""""hot_n":${hotAll.size},"q_unit":"$unit","queries":$qs,"sf":"$sfDir"}"""
      }
      val headline = med.filter(_._2 >= 0).sortBy(_._1).take(6)
        .map { case (k, v, _) => "\"" + k.takeWhile(_ != '_') + "\":" + f3(v) }
        .mkString("{", ",", "}")
      val headLine =
        s"""{"metric":"total","value":${f3(total)},"unit":"sec","runs":$runs,""" +
        s""""stream_total":${f3(streamTotal)},"gate_total":${f3(total - streamTotal)},""" +
        s""""n":${med.count(_._2 >= 0)},"ext_peak":${f3(extPeak)},$rec""" +
        s""""hot_n":${hotAll.size},"queries":$headline,"sf":"$sfDir"}"""
      shortLine = Seq(tail("cs", 100.0), tail("ds", 10.0), headLine)
        .find(_.length <= 1950).getOrElse(headLine)
      println(shortLine)
      System.out.flush()
      val passJson = perPass.map(p =>
        names.map(n => s""""$n":${p(n).sec}""").mkString("{", ",", "}"))
        .mkString("[", ",", "]")
      val extJson = perPass.map(p =>
        names.map(n => s""""$n":${f3(p(n).ext)}""").mkString("{", ",", "}"))
        .mkString("[", ",", "]")
      val retimedJson = retimed.toSeq.sortBy(_._1).map { case (n, m) =>
        s""""$n":{"sec":${f3(m.sec)},"ext":${f3(m.ext)}}""" }
        .mkString("{", ",", "}")
      val medJson = med.map { case (k, v, _) => s""""$k":${f3(v)}""" }
        .mkString("{", ",", "}")
      val hotFull = hotAll.map("\"" + _._1 + "\"").mkString("[", ",", "]")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(fullPath),
        s"""{"metric":"total","value":${f3(total)},"unit":"sec","runs":$runs,""" +
          s""""stream_total":${f3(streamTotal)},"gate_total":${f3(total - streamTotal)},""" +
          s""""load_avg":[${f3(loadBefore)},${f3(loadAvg)}],""" +
          // ext_gate = the configured clean-pass threshold; ext_peak =
          // the worst external-CPU reading actually measured (named so
          // a reader cannot mistake the config for a measurement)
          s""""ext_gate":${f3(extMax)},"ext_peak":${f3(
            perPass.flatMap(_.values.map(_.ext)).foldLeft(0.0)(math.max))},""" +
          s""""hot":$hotFull,""" +
          s""""load_gate":${gateEvents.mkString("[", ",", "]")},""" +
          s""""queries":$medJson,"passes":$passJson,""" +
          s""""passes_ext":$extJson,"retimed":$retimedJson,"sf":"$sfDir"}""")
    }

    // Warmup: one full-inventory pass at the MEASURED sf — §4's "1
    // warm-up then median". Rounds 1-2 warmed at sf0.001 instead, so the
    // first measured pass paid every query's sf-specific first-touch
    // (codegen for actual stats, ORC/CSV writer init, broadcast builds)
    // on top of GC settling; that plus the 8g heap is what inflated the
    // BENCH_r01/r02 artifacts. Warming at sfDir makes every timed pass
    // steady-state. The warmup is itself timed and emitted as a
    // `"runs":0` line so even a run killed right after warmup leaves a
    // parseable (if first-touch-inflated) artifact in the tail.
    // (per-query deadline guard here too: a warmup that blows the whole
    // budget must still end with a parseable runs:0 line, not rc=124)
    loadGate("warmup")
    val warmup: Map[String, M] =
      names.map(n => n -> (if (remaining < 20) M(-1.0, 0.0) else once(n))).toMap
    spark.catalog.clearCache() // drop warmup-cached subtrees
    emit(Seq(warmup), runs = 0)
    // Spark frees broadcast/shuffle blocks via weak references (the
    // ContextCleaner only sees them after a GC), so a 106-query warmup
    // leaves thousands of dead blocks pinning the heap; settle before
    // the first timed pass.
    System.gc()
    Thread.sleep(3000)
    // view registration is session setup (driver-side file listing),
    // not per-query work — do it for the measured dir before timing.
    // Fenced: this loads every fixture table, and an un-loadable table
    // here must cost only the queries that need it (per-query -1), not
    // the whole artifact — r7's events schema drift killed the round's
    // bench precisely because this line ran unfenced.
    try graft.operators.SqlFrontend.registerViews(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[bench] view registration failed: ${e.getMessage}")
    }

    // pass-major order (whole inventory, then again) rather than
    // query-major (same query 3× back to back): repeated immediate runs
    // would hit the OS page cache and JIT state in a way a driver's
    // single pass would not, flattering the median.
    val perPass = scala.collection.mutable.ArrayBuffer.empty[Map[String, M]]
    var slowestPass = warmup.values.map(_.sec).filter(_ >= 0).sum
    var fits = true
    while (perPass.size < maxPasses && fits) {
      // projected next-pass cost from the slowest pass so far (warmup
      // included), padded 1.3× for contention, +15 s teardown slack
      fits = remaining > slowestPass * 1.3 + 15
      if (fits) {
        loadGate(s"pass${perPass.size + 1}")
        val passT0 = elapsed
        // Per-query deadline check INSIDE the pass: a contention burst
        // can stretch a pass well past its projection (r4 ran at load
        // 3.2), and one hung query must not ride into the driver's
        // hard timeout — the partial pass is discarded and the artifact
        // keeps the completed passes' medians.
        val p = scala.collection.mutable.Map.empty[String, M]
        var aborted = false
        for (n <- names if !aborted) {
          if (remaining < 20) aborted = true
          else p(n) = once(n)
        }
        if (aborted) {
          System.err.println(s"[bench] pass ${perPass.size + 1} aborted at " +
            s"${p.size}/${names.size} queries (deadline)")
          fits = false
        } else {
          slowestPass = math.max(slowestPass, elapsed - passT0)
          perPass += p.toMap
        }
        // per-invocation .cache()s (dedup/similarity kernels) accumulate
        // across a pass; drop them so pass N+1 starts from the same
        // state pass 1 did (and give the weak-ref cleaner a GC to see
        // the dropped blocks)
        spark.catalog.clearCache()
        if (perPass.nonEmpty) emit(perPass.toSeq, runs = perPass.size)
        System.gc()
      }
    }

    // Contamination rescue: queries whose EVERY successful measurement
    // carried an external-CPU stamp above extMax get one re-time behind
    // a fresh load gate (budget permitting); the final emit folds the
    // clean re-times into the medians and lists whatever remains
    // unclean under "hot".
    val hotNow = names.filter { n =>
      perPass.nonEmpty &&
      perPass.forall(p => { val m = p(n); m.sec < 0 || m.ext > extMax }) &&
      perPass.exists(_(n).sec >= 0)
    }
    val retimed = scala.collection.mutable.Map.empty[String, M]
    // cap at 24 re-times: a genuine burst touches a handful of adjacent
    // queries; an all-hot run means the HOST is unusable and re-timing
    // the whole inventory would only blow the deadline and the
    // compact-line budget (each retime adds a gate event)
    for (n <- hotNow.take(24) if remaining > 30) {
      loadGate(s"retime:${n.takeWhile(_ != '_')}")
      val m = once(n)
      if (m.sec >= 0) retimed(n) = m
    }
    if (perPass.nonEmpty && (retimed.nonEmpty || hotNow.nonEmpty))
      emit(perPass.toSeq, runs = perPass.size, retimed = retimed.toMap)

    cleanExit = true
    spark.stop()
  }
}
