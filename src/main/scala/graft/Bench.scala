package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: headline queries on SPARK_GRAFT_SF_DIR, one JSON
  * line on stdout. Each query executes fully through a `noop`-format write
  * (a bare `.count()` would let Catalyst prune the projections under
  * measurement). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.experimental.extraOptimizations = Seq(graft.plans.PushableKeyCast)
    spark.experimental.extraStrategies = Seq(graft.plans.TopKPerKeyStrategy)
    // dev-only subset filter (tools/scale_sweep.py uses it to time its
    // canary-scale subset); the driver sets nothing and measures all.
    // Unknown names fail loudly, same contract as Verify's filter.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    // per-query shuffle-partition override ("name=N,name2=M"): the scale
    // sweeps size the exchange to the synthetic corpus — a deployment
    // scales spark.sql.shuffle.partitions with input (COST.md §2), which
    // local[32]'s pinned 32 cannot express; als1 at x100 (60M ratings)
    // spilled on 32 and read exp 1.14 for it (SCALE.md §R12). AQE
    // coalesces the excess, so over-provisioning is safe. Runtime-set
    // before each query (overridden queries set theirs; everything else
    // runs at the default, re-set before its own run). The driver sets
    // nothing.
    val defaultShuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val shuffleByQuery: Map[String, String] =
      sys.env.get("SPARK_GRAFT_SHUFFLE_BY_QUERY")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).map { kv =>
          val parts = kv.split("=", 2)
          require(parts.length == 2 && parts(0).trim.nonEmpty
              && !parts(1).contains("="),
            s"bad shuffle override '$kv': expected name=N")
          require(scala.util.Try(parts(1).trim.toInt).filter(_ > 0).isSuccess,
            s"bad shuffle override '$kv': N must be a positive int")
          parts(0).trim -> parts(1).trim
        }.toMap).getOrElse(Map.empty)
    // retired rows (BASELINE.md tier policy) run only when explicitly
    // named — a default full run measures the active wall alone. An
    // explicit ONLY may also name any REGISTERED query (the scale
    // sweeps measure verify-tier shapes without adding wall rows); the
    // default run stays exactly the active bench wall.
    val benchable = Queries.benchNames ++ Queries.retiredBenchNames
    only.foreach { ns =>
      val unknown = ns -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names not registered queries: ${unknown.mkString(", ")}")
    }
    val names = only match {
      case Some(sel) =>
        (benchable ++ (SparkEntry.queries.keySet -- benchable.toSet).toSeq.sorted)
          .filter(sel.contains)
      case None =>
        benchable.filter(SparkEntry.queries.contains)
          .filterNot(Queries.retiredBenchNames.contains)
    }
    // warm every query shape at the smallest SF first: moves Janino codegen
    // compilation + JIT out of the measured runs (steady-state throughput is
    // what the 100 TB story depends on, not per-plan compile time)
    names.foreach { name =>
      try SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").write
        .format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // bucketed-table setup is write-time work a real deployment pays once,
    // not per query — do it before the measured runs
    try Tables.ensureBucketed(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[bench] bucketed setup failed: ${e.getMessage}")
    }
    def measure(): Seq[(String, Double, Boolean)] = names.map { name =>
      val fn = SparkEntry.queries(name)
      spark.conf.set("spark.sql.shuffle.partitions",
        shuffleByQuery.getOrElse(name, defaultShuffle))
      // settle the JVM between queries: prior queries' shuffle/broadcast
      // garbage otherwise lands in the next query's measurement
      System.gc()
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    // canaries: code-untouched queries whose drift measures VM noise, not
    // regressions — BASELINE.md records them moving in lockstep across
    // identical-config runs (51→90 s totals). Reported so any round-over-
    // round comparison can normalize by them.
    val canaryNames = Seq("q1_pricing_summary", "t7_tfidf", "d4_ngram_jaccard")
    // canary ENFORCEMENT (BASELINE.md §rounds 5–7): the protocol's decision
    // rule lives here, not in reviewer discipline. Reference = the r7
    // quiet-machine levels at sf0.1/local[32]; a run whose worst canary
    // sits >1.35× above them is stamped `contended` — its raw totals must
    // not be compared (r7's mildly contended run: max ratio 1.41; round
    // 6's bad run: 2.9; the quiet reference itself: 1.0). Other SFs have
    // no recorded reference → `uncalibrated`.
    val quietRef = Map(
      "q1_pricing_summary" -> 1.22, "t7_tfidf" -> 0.96, "d4_ngram_jaccard" -> 0.76)
    def ratiosOf(results: Seq[(String, Double, Boolean)]): Seq[Double] = {
      val canaryTimes = canaryNames.flatMap(c =>
        results.collectFirst { case (`c`, v, true) => c -> v })
      canaryTimes.collect { case (c, v) if quietRef.contains(c) => v / quietRef(c) }
    }
    def qualityOf(ratios: Seq[Double]): String =
      if (only.nonEmpty) "subset" // filtered runs aren't protocol artifacts
      else if (!sfDir.replace("/", "").endsWith("sf0.1")) "uncalibrated"
      else if (ratios.size < quietRef.size) "contended" // a canary errored
      else if (ratios.max <= 1.35) "quiet"
      else "contended"
    // contended auto-rerun (round-8 verdict item): a `contended` stamp on
    // a full protocol run means VM noise, not code — so the runner itself
    // retries ONCE after a cool-down instead of leaving the round artifact
    // for a human to adjudicate. If the retry is also contended, keep
    // whichever attempt had the calmer canaries and stamp it honestly.
    var results = measure()
    var ratios = ratiosOf(results)
    var quality = qualityOf(ratios)
    var reruns = 0
    if (quality == "contended") {
      System.err.println(s"[bench] contended run (canary max ratio " +
        s"${if (ratios.isEmpty) "n/a" else ratios.max.toString}); cooling " +
        "down 30s and re-measuring once")
      System.gc()
      Thread.sleep(30000)
      val again = measure()
      val againRatios = ratiosOf(again)
      reruns = 1
      val firstKey = if (ratios.isEmpty) Double.MaxValue else ratios.max
      val againKey = if (againRatios.isEmpty) Double.MaxValue else againRatios.max
      if (againKey < firstKey) {
        results = again; ratios = againRatios; quality = qualityOf(againRatios)
      }
    }
    // a failed query must be visible in the JSON but must NOT poison naive
    // consumers that sum the queries map: JSON null, plus the errors array
    // (a -1.0 sentinel here once skewed a 32-error round's totals)
    // Values rounded to 0.1 ms: full Double.toString precision is noise and
    // doubles the line length the driver must capture.
    def r4(v: Double): String = (math.round(v * 10000) / 10000.0).toString
    val qs = results.map { case (k, v, ok) =>
      "\"" + k + "\":" + (if (ok) r4(v) else "null")
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    val canaryTimes = canaryNames.flatMap(c =>
      results.collectFirst { case (`c`, v, true) => c -> v })
    val canaries = canaryTimes
      .map { case (c, v) => "\"" + c + "\":" + v }.mkString("{", ",", "}")
    // NOT the f-interpolator: it is default-locale-sensitive (comma
    // decimal separators would corrupt the JSON); Double.toString is not
    val maxRatio =
      if (ratios.isEmpty) "null"
      else (math.round(ratios.max * 100) / 100.0).toString
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"canaries":$canaries,"quality":"$quality","canary_max_ratio":$maxRatio,"reruns":$reruns,"sf":"$sfDir"}"""
    println(json)
    // Legacy compact summary, DEMOTED to a mid-stream line (round-16 fix,
    // VERDICT r15 item 1): when this line was LAST, the driver's
    // last-JSON-line parse saw "queries":{} and its per-query comparison
    // went blind (PERF_r15 per_query {}, n_common 0, empty scaling block).
    // The driver contract is ONE JSON line whose "queries" carries the full
    // per-query map — that full line is now printed LAST, below. This line
    // survives only as a short human-readable summary near the end of the
    // log; nothing machine-parses it.
    val compact =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":{},"errors":$errs,"canaries":$canaries,"quality":"$quality","canary_max_ratio":$maxRatio,"reruns":$reruns,"n_queries":${results.size},"compact":true,"full_artifact":"the FULL per-query line follows after spark.stop; also persisted under docs/bench (SPARK_GRAFT_BENCH_OUT)","operative_quiet":"if this run's quality is contended, the operative number is the committed docs/bench/bench_r{N}_quiet.json named in BASELINE.md's current round section","sf":"$sfDir"}"""
    println(compact)
    // stdout through sbt is interleaved with log spew and can truncate —
    // also persist the full machine-readable artifact to files.
    // `bench_latest.json` means "most recent full run", not "operative
    // protocol artifact": the operative quiet run is the one BASELINE.md
    // stamps (docs/bench/bench_r{N}_quiet.json). Successive runs used to
    // OVERWRITE bench_latest.json (VERDICT r15: an 8-core run destroyed the
    // 32-core per-query record) — every run now ALSO writes a
    // per-run-named artifact under docs/bench/runs/ that is never clobbered.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "docs/bench/bench_latest.json")
    val runFile = s"docs/bench/runs/bench_${System.currentTimeMillis}_c${cpus}_$quality.json"
    Seq(outFile, runFile).foreach { f =>
      try {
        val p = java.nio.file.Paths.get(f)
        if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.write(p, (json + "\n").getBytes("UTF-8"))
      } catch { case e: Throwable =>
        System.err.println(s"[bench] could not write $f: ${e.getMessage}")
      }
    }
    spark.stop()
    // LAST stdout line of the process: the FULL per-query JSON line — the
    // driver parses the last JSON line for its per-query/scaling comparison
    // (PERF_r{N}), so this must be the complete map, not the compact stub.
    println(json)
  }
}
