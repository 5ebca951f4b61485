package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":"total","value":N,"unit":"sec",...}.
  *
  * Measurement hygiene: queries run in sorted (deterministic) order; a full
  * warmup pass absorbs JVM/codegen/IO-cache warmup; results are materialized
  * through the noop sink so every column is computed (a bare .count() lets
  * Catalyst prune projections and under-measures).
  *
  * The suite is timed SPARK_GRAFT_BENCH_REPS times (default 3) and the
  * recorded value per query is the MEDIAN across reps — a single contended
  * run (GC storm, noisy neighbor) must not stand as the round's artifact
  * (the r4 recorded run showed a spurious 4x dd_* blowup no repeat
  * reproduced). A rep whose total deviates >30% from the median total is
  * flagged on stderr as a contended outlier.
  *
  * r16: the artifact additionally carries ANCHOR-NORMALIZED numbers
  * (tools.BenchNorm) — per-rep face times scaled by
  * nominal/rep_cpu_ms before the cross-rep median ("queries_norm",
  * "value_norm"), and an OFFICIAL table taking the per-face MIN of the
  * normalized medians across all same-code same-sf history runs
  * ("queries_official", "value_official", "code", "same_code_runs").
  * Rationale: r15 ran identical code four times and totals spanned
  * 314.5-393.7 s purely on box speed (anchors 58.8-110.4 ms); trend
  * reads should use value_official, which box speed cannot move.
  */
object Bench {
  private def loadavg(): Double =
    try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")),
      java.nio.charset.StandardCharsets.UTF_8).split(" ")(0).toDouble
    catch { case _: Throwable => -1.0 }

  private val osBean = java.lang.management.ManagementFactory
    .getOperatingSystemMXBean
    .asInstanceOf[com.sun.management.OperatingSystemMXBean]

  /** EXTERNAL busy cores right now: (system CPU − this JVM's CPU) × cores,
    * averaged over `windowMs`. This is the r9 VERDICT's "self-load
    * calibration": 1-min loadavg at a rep start mostly remembers OUR OWN
    * previous rep (it decays over minutes), so it cannot distinguish a
    * noisy neighbor from the bench itself — the instantaneous system-minus-
    * process difference can. -1 when the MXBean has no reading yet. */
  private def extCores(windowMs: Int): Double = {
    val n = Runtime.getRuntime.availableProcessors
    val samples = scala.collection.mutable.ArrayBuffer.empty[Double]
    val t0 = System.nanoTime()
    while ((System.nanoTime() - t0) / 1e6 < windowMs) {
      val sys = osBean.getCpuLoad
      val proc = osBean.getProcessCpuLoad
      if (sys >= 0 && proc >= 0) samples += math.max(0.0, (sys - proc) * n)
      Thread.sleep(200)
    }
    if (samples.isEmpty) -1.0 else samples.sum / samples.size
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Load gate — BEFORE the session starts (our own executor threads
    // inflate loadavg once work begins): all five r7-code official runs
    // measured 1-min load 3.2-6.8, and same-code totals spanned 70-93 s
    // contended vs 38 s quiet, so trend reads stay forensic until a run
    // can say "the box was quiet when I started". If load is above the
    // threshold, wait up to gateMaxWaits × 30 s for it to drain, then
    // measure anyway — the artifact records threshold, waits, the load
    // actually seen at start, and whether the gate passed.
    val gateThreshold = sys.env.getOrElse("SPARK_GRAFT_LOAD_GATE", "1.5").toDouble
    val gateMaxWaits = sys.env.getOrElse("SPARK_GRAFT_LOAD_GATE_WAITS", "10").toInt
    var gateWaits = 0
    while (loadavg() > gateThreshold && gateWaits < gateMaxWaits) {
      System.err.println(f"[bench] load gate: 1-min loadavg ${loadavg()}%.2f > " +
        f"$gateThreshold%.1f — waiting 30 s (${gateWaits + 1}/$gateMaxWaits)")
      Thread.sleep(30000)
      gateWaits += 1
    }
    val gateLoad = loadavg()
    val gatePassed = gateLoad >= 0 && gateLoad <= gateThreshold
    if (!gatePassed)
      System.err.println(f"[bench] load gate GAVE UP after $gateWaits waits " +
        f"(load still $gateLoad%.2f) — measuring contended; artifact says so")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // r17: the suite cycles ~400 distinct plans per rep; the default
      // 100-entry codegen class cache thrashes and Janino recompiles every
      // face's generated classes every rep (thread samples caught
      // CodeGenerator.compile mid-bench). Static conf, so set at session
      // build; sized for a wide query surface, scale-independent.
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // *_check keys are CORRECTNESS-only faces (sketch + exact + bound
    // boolean): benching them would re-time the exact computation the
    // sketch operators exist to avoid — skip them here; Verify runs them.
    val ordered = SparkEntry.queries.toSeq
      .filterNot(_._1.endsWith("_check")).sortBy(_._1)
    type Fn = (SparkSession, String) => org.apache.spark.sql.DataFrame
    def runOne(fn: Fn): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // warmup pass (untimed)
    ordered.foreach { case (_, fn) => try runOne(fn) catch { case _: Throwable => } }
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    // Load provenance: r6's official artifact was a contended-mode run
    // (65 s vs 26-32 s same-code uncontended) with nothing in the artifact
    // saying so. Record 1-min loadavg before/after plus per-rep totals so
    // every future line carries its own noise context.
    val loadBefore = loadavg()
    def timedPass(): Seq[(String, Double)] = ordered.map { case (name, fn) =>
      System.gc() // don't bill one query for its predecessors' garbage
      val t0 = System.nanoTime()
      // a failed query reports -1, not a bogus small timing
      val t = try { runOne(fn); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          -1.0
        }
      name -> t
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.isEmpty) -1.0
      else if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    // Per-rep load provenance: r8's gate passed at 1.02 but load hit 1.91
    // by rep 1 — a contended official run must self-identify PER REP, not
    // just at the endpoints. r10: the gate also re-checks BETWEEN reps on
    // EXTERNAL cpu (extCores — self-load disentangled: loadavg at rep 1+
    // start mostly remembers our own rep 0), waiting up to 6×15 s for the
    // box to quiet so at least the min-ext rep is demonstrably
    // uncontended; a during-rep sampler records the mean external load
    // each rep actually ran under.
    val repLoads = scala.collection.mutable.ArrayBuffer.empty[Double]
    val repExtStart = scala.collection.mutable.ArrayBuffer.empty[Double]
    val repExtMean = scala.collection.mutable.ArrayBuffer.empty[Double]
    val repGateWaits = scala.collection.mutable.ArrayBuffer.empty[Int]
    // CPU speed calibration: a fixed single-thread splitmix64 loop timed
    // before each rep. Cross-ROUND totals moved 115→157 s (1.27× on every
    // face uniformly, external load ~0.1 cores) — a host-level speed
    // change the load gauges cannot see. cpu_ref_ms gives every history
    // line an absolute machine-speed anchor: face_time / (cpu_ref_ms /
    // nominal) is comparable across rounds even when the box changes.
    def cpuProbeMs(): Double = graft.tools.BenchNorm.cpuProbeMs()
    val repCpuMs = scala.collection.mutable.ArrayBuffer.empty[Double]
    val passes = (1 to reps).map { i =>
      var w = 0
      var ext = extCores(2000)
      while (ext > gateThreshold && w < 6) {
        System.err.println(f"[bench] rep $i gate: external load $ext%.2f cores > " +
          f"$gateThreshold%.1f — waiting 15 s (${w + 1}/6)")
        Thread.sleep(15000)
        ext = extCores(2000)
        w += 1
      }
      repLoads += loadavg()
      repExtStart += ext
      repGateWaits += w
      repCpuMs += cpuProbeMs()
      val acc = scala.collection.mutable.ArrayBuffer.empty[Double]
      @volatile var sampling = true
      val sampler = new Thread(() => {
        while (sampling) {
          val s = osBean.getCpuLoad
          val p = osBean.getProcessCpuLoad
          if (s >= 0 && p >= 0)
            acc.synchronized {
              acc += math.max(0.0,
                (s - p) * Runtime.getRuntime.availableProcessors)
            }
          Thread.sleep(500)
        }
      })
      sampler.setDaemon(true)
      sampler.start()
      val p = try timedPass() finally { sampling = false; sampler.join(1000) }
      repExtMean += acc.synchronized {
        if (acc.isEmpty) -1.0 else acc.sum / acc.size
      }
      System.err.println(f"[bench] rep $i/$reps total ${p.map(_._2).filter(_ >= 0).sum}%.1f s" +
        f" (loadavg ${repLoads.last}%.2f, ext-start ${repExtStart.last}%.2f, " +
        f"ext-mean ${repExtMean.last}%.2f cores)")
      p
    }
    val nominalMs = sys.env.getOrElse("SPARK_GRAFT_ANCHOR_NOMINAL_MS",
      graft.tools.BenchNorm.NominalAnchorMs.toString).toDouble
    // r18 (r17 VERDICT #7): per-face CONTENDED-REP EXCLUSION. A rep whose
    // CPU anchor ran >1.4× nominal executed on a contended/slow box (the
    // r17 PERF run's rep 2 anchored 110.5 ms vs 70 nominal and printed two
    // phantom face regressions, q_link_predict and pipeline_train_corpus,
    // that the same code never reproduced on a quiet box). Such reps are
    // dropped from the per-face RAW median when at least one clean rep
    // exists; the artifact records how many were excluded
    // ("rep_excluded") and the history line keeps the unexcluded table
    // ("queries_allreps") so the old methodology's numbers stay readable.
    val repClean: Seq[Boolean] =
      repCpuMs.map(ms => ms > 0 && ms <= nominalMs * 1.4).toSeq
    val repExcluded =
      if (repClean.exists(identity)) repClean.count(c => !c) else 0
    def faceMedian(name: String, excludeContended: Boolean): Double = {
      val ts = passes.zip(repClean).flatMap { case (p, clean) =>
        if (excludeContended && !clean) None
        else p.collectFirst { case (`name`, t) if t >= 0 => t }
      }
      if (ts.nonEmpty) median(ts) else -1.0
    }
    // per-query median across reps; a query counts only reps where it ran
    val resultsAllReps = ordered.map { case (name, _) =>
      name -> faceMedian(name, excludeContended = false)
    }
    val results =
      if (repExcluded == 0) resultsAllReps
      else ordered.map { case (name, _) =>
        name -> faceMedian(name, excludeContended = true)
      }
    // Anchor-NORMALIZED per-face table (r15 VERDICT #1): per-rep times
    // scaled by nominal/anchor before the cross-rep median, so a box
    // running 1.5× slow (r15 saw 58.8-110.4 ms anchors on identical
    // code) cannot print as a face regression. Arithmetic lives in
    // tools.BenchNorm; BenchNormSpec pins it.
    val resultsNorm = ordered.map { case (name, _) =>
      val perRep = passes.map(p =>
        p.collectFirst { case (`name`, t) => t }.getOrElse(-1.0))
      name -> graft.tools.BenchNorm.normalizedMedianSec(
        perRep, repCpuMs.toSeq, nominalMs)
    }
    // OFFICIAL table: per-face MIN of the normalized medians across all
    // SAME-CODE, SAME-SF runs in BENCH_HISTORY plus this one — residual
    // contention only inflates, so min estimates the uncontended cost,
    // and identical code can never regress against itself.
    val codeFp = graft.tools.BenchNorm.codeFingerprint()
    val histLines: Seq[String] =
      try {
        val p = java.nio.file.Paths.get("BENCH_HISTORY.jsonl")
        if (java.nio.file.Files.isRegularFile(p))
          new String(java.nio.file.Files.readAllBytes(p),
            java.nio.charset.StandardCharsets.UTF_8).linesIterator.toSeq
        else Seq.empty
      } catch { case _: Exception => Seq.empty }
    val (official, sameCodeRuns) = graft.tools.BenchNorm.officialMin(
      histLines, codeFp, sfDir, resultsNorm.toMap, nominalMs)
    val officialOrdered = resultsNorm.map { case (k, _) => k -> official(k) }
    // contended-outlier detector: a rep far off the median total is noise
    val repTotals = passes.map(_.map(_._2).filter(_ >= 0).sum)
    val medTotal = median(repTotals)
    repTotals.zipWithIndex.foreach { case (tot, i) =>
      if (medTotal > 0 && math.abs(tot - medTotal) / medTotal > 0.3)
        System.err.println(f"[bench] WARNING rep ${i + 1} total $tot%.1f s deviates >30%% " +
          f"from median $medTotal%.1f s — contended outlier, median shields the artifact")
    }
    val loadAfter = loadavg()
    def r2(v: Double): String = (math.rint(v * 100) / 100).toString
    // min_rep_total: the least-contended rep's whole-suite time — on a
    // noisy box the median can still be inflated (2 of 3 reps contended,
    // r8's 120/103/100), while the min is the best available estimate of
    // the uncontended cost. Trend reads should prefer it when rep_loads
    // show contention.
    val minRepTotal = if (repTotals.nonEmpty) repTotals.min else -1.0
    val provenance =
      s""""load":{"before":${r2(loadBefore)},"after":${r2(loadAfter)}},""" +
      s""""gate":{"threshold":${r2(gateThreshold)},"waits":$gateWaits,""" +
      s""""load_at_start":${r2(gateLoad)},"passed":$gatePassed},""" +
      s""""rep_totals":[${repTotals.map(r2).mkString(",")}],""" +
      s""""rep_loads":[${repLoads.map(r2).mkString(",")}],""" +
      s""""rep_ext_start":[${repExtStart.map(r2).mkString(",")}],""" +
      s""""rep_ext_mean":[${repExtMean.map(r2).mkString(",")}],""" +
      s""""rep_gate_waits":[${repGateWaits.mkString(",")}],""" +
      s""""rep_cpu_ms":[${repCpuMs.map(r2).mkString(",")}],""" +
      s""""rep_excluded":$repExcluded,""" +
      s""""min_rep_total":${r2(minRepTotal)},""" +
      s""""code":"$codeFp","anchor_nominal_ms":${r2(nominalMs)},""" +
      s""""same_code_runs":$sameCodeRuns"""
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    def faceJson(m: Seq[(String, Double)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + (math.rint(v * 1000) / 1000) }
        .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val totalNorm = resultsNorm.map(_._2).filter(_ >= 0).sum
    val totalOfficial = officialOrdered.map(_._2).filter(_ >= 0).sum
    reportTrend(results, resultsNorm, sfDir)
    val allRepsJson =
      if (repExcluded == 0) ""
      else s""""queries_allreps":${faceJson(resultsAllReps)},"""
    val fullLine = s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""value_norm":${r2(totalNorm)},"value_official":${r2(totalOfficial)},""" +
      s"""$provenance,"queries":$qs,""" +
      s"""$allRepsJson""" +
      s""""queries_norm":${faceJson(resultsNorm)},""" +
      s""""queries_official":${faceJson(officialOrdered)},"sf":"$sfDir"}"""
    // The driver truncates stderr/stdout when archiving (r3's trend baseline
    // was lost exactly this way); persist the full per-query table twice —
    // target/bench_full.json (this run) and an append-only committed history
    // file that future rounds' trend reports read first.
    try {
      val dir = java.nio.file.Paths.get("target")
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.write(dir.resolve("bench_full.json"),
        fullLine.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_HISTORY.jsonl"),
        (fullLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    } catch { case e: Exception => System.err.println(s"[bench] persist skipped: $e") }
    // The driver's archive keeps only the LAST ~2000 chars of output and
    // parses the final line as JSON — a full 87-query table (~2.8 KB) gets
    // its head truncated and fails to parse (BENCH_r01–r05 all recorded
    // parsed:null). Emit a budgeted line on stdout: ms precision, slowest
    // queries first, stop before the line outgrows the window. The complete
    // full-precision table lives in BENCH_HISTORY.jsonl (committed) and
    // target/bench_full.json.
    def ms(v: Double): String = (math.rint(v * 1000) / 1000).toString
    val header = s"""{"metric":"total","value":${ms(total)},"unit":"sec",""" +
      s""""value_norm":${ms(totalNorm)},"value_official":${ms(totalOfficial)},""" +
      s"""$provenance,"sf":"$sfDir","queries_full":"BENCH_HISTORY.jsonl","queries":{"""
    // r18 (r17 VERDICT #2): the stdout face set is STABLE, not "slowest
    // first". The driver diffs consecutive rounds' parsed stdout maps, so
    // a face that merely got FASTER and fell out of a slowest-K window
    // printed as "dropped_from_bench" (12 false drops in PERF_r17, capping
    // the comparison at 45 common faces). Fix: re-emit every face the
    // latest committed BENCH_r*.json artifact parsed (those are exactly
    // the faces the driver will look for), then fill the remaining budget
    // slowest-first. The window stays 2000 chars (BENCH_r01–r05 lost their
    // heads to it), so the full 396-face table still lives in
    // BENCH_HISTORY.jsonl / target/bench_full.json.
    val faceNames = results.map(_._1).toSet
    val prevStdoutFaces: Set[String] = try {
      Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
        .filter(_.getName.matches("BENCH_r\\d+\\.json"))
        .sortBy(f => "\\d+".r.findFirstIn(f.getName).map(_.toInt).getOrElse(0))
        .lastOption.map { f =>
          val text = new String(java.nio.file.Files.readAllBytes(f.toPath),
            java.nio.charset.StandardCharsets.UTF_8)
          "\"([A-Za-z0-9_]+)\"\\s*:\\s*[0-9.]+".r.findAllMatchIn(text)
            .map(_.group(1)).toSet.intersect(faceNames)
        }.getOrElse(Set.empty)
    } catch { case _: Exception => Set.empty[String] }
    val budget = 1955 - header.length
    val entries = results.filter(_._2 >= 0)
      .sortBy { case (k, v) => (!prevStdoutFaces.contains(k), -v) }
      .map { case (k, v) => "\"" + k + "\":" + ms(v) }
    val kept = entries.scanLeft(0)(_ + _.length + 1).tail
      .zip(entries).takeWhile(_._1 <= budget).map(_._2)
    val stdoutLine = header + kept.mkString(",") + "}}"
    if (kept.size < entries.size)
      System.err.println(s"[bench] stdout line budget kept ${kept.size}/${entries.size} " +
        s"queries (${prevStdoutFaces.size} stable-set first, then slowest); " +
        "full table in BENCH_HISTORY.jsonl")
    // stop() BEFORE the final println: Spark's shutdown logging must not
    // land after the line the driver parses.
    try spark.stop() catch { case _: Throwable => }
    println(stdoutLine)
  }

  /** Per-query deltas vs the previous round's BENCH_r*.json (stderr only —
    * stdout stays the single JSON line the driver parses). Flags >1.3x
    * moves so a regression gets an explanation at build time, not at
    * judging time. r16: compares ANCHOR-NORMALIZED values when the
    * history line carries queries_norm (and this run's normalized
    * table), so the stderr trend can't print the phantom box-speed
    * regressions the artifact-side normalization already kills; raw
    * values remain the fallback against pre-r16 lines. */
  private def reportTrend(resultsRaw: Seq[(String, Double)],
      resultsNorm: Seq[(String, Double)], sfDir: String): Unit = try {
    // Prefer our own append-only history (complete by construction); fall
    // back to the driver's BENCH_r*.json capture, which may be truncated.
    // History lines from a DIFFERENT scale factor are skipped — a smoke
    // run at sf0.001 must not become the baseline for an sf0.1 run.
    val hist = new java.io.File("BENCH_HISTORY.jsonl")
    val histLine: Option[String] =
      if (!hist.isFile) None
      else new String(java.nio.file.Files.readAllBytes(hist.toPath),
          java.nio.charset.StandardCharsets.UTF_8)
        .linesIterator.filter(_.contains("\"sf\":\"" + sfDir + "\""))
        .toSeq.lastOption
    val prev: Option[java.io.File] =
      if (histLine.isDefined) Some(hist)
      else Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
        .filter(_.getName.matches("BENCH_r\\d+\\.json"))
        // numeric round sort: lexicographic picks r9 over r10
        .sortBy(f => "\\d+".r.findFirstIn(f.getName).map(_.toInt).getOrElse(0))
        .lastOption
    prev.foreach { f =>
      // The driver wraps (and truncates) the bench JSON line inside a JSON
      // string field, so quotes arrive backslash-escaped — unescape, then
      // scrape "name":seconds pairs out of the raw text. For the history
      // file, use only its last SAME-SF line. If the driver capture holds
      // no pairs (tail-only truncation), scrape the trend table's own
      // "name  a ->  b s" rows as the baseline.
      val text = histLine.getOrElse(
        new String(java.nio.file.Files.readAllBytes(f.toPath),
          java.nio.charset.StandardCharsets.UTF_8)).replace("\\\"", "\"")
      // normalized baseline preferred; note the generic pair scrape
      // below would otherwise pick the LAST face map in an r16+ line
      // (queries_official) while comparing raw values — wrong on both
      // sides
      val normBase = graft.tools.BenchNorm.faceMap(text, "queries_norm")
      val useNorm = normBase.nonEmpty
      val results = if (useNorm) resultsNorm else resultsRaw
      val pair = "\"([A-Za-z0-9_]+)\":([0-9]+\\.[0-9]+)".r
      val arrow = "([A-Za-z0-9_]+)\\s+[0-9.]+ ->\\s+([0-9.]+) s".r
      val direct = pair.findAllMatchIn(text)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
      val old =
        if (useNorm) normBase
        else if (direct.nonEmpty) direct
        else arrow.findAllMatchIn(text)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      System.err.println(s"[bench] trend vs ${f.getName}" +
        (if (useNorm) " (anchor-normalized)" else "") + ":")
      results.foreach { case (name, t) =>
        old.get(name) match {
          case Some(p) if p > 0 && t > 0 =>
            val ratio = t / p
            val flag =
              if (ratio > 1.3) "  REGRESSION" else if (ratio < 1 / 1.3) "  improved" else ""
            System.err.println(f"[bench]   $name%-24s $p%7.3f -> $t%7.3f s (${ratio}%4.2fx)$flag")
          case _ =>
            System.err.println(f"[bench]   $name%-24s     new -> $t%7.3f s")
        }
      }
    }
  } catch { case e: Exception => System.err.println(s"[bench] trend skipped: $e") }
}
