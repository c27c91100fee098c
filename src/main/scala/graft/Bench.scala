package graft
import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: one JSON line to stdout + the same line to
 * `SPARK_GRAFT_BENCH_OUT` (default bench_out.json) + a richer
 * bench_detail.json (per-query warm min/med/max, machine-state marks).
 *
 * Contention-proofing (VERDICT r6 next #1 — round 6 shipped two
 * irreconcilable sf1 artifacts, 774 s under a loaded machine vs 50 s
 * idle, and the harness had no way to tell the driver which to trust):
 *  - the warm pass runs EVERY query 3x consecutively and reports the
 *    per-query MEDIAN (sum of medians = warm_total); min/median/max go
 *    to bench_detail.json. External load hits the reps unevenly, so
 *    median-of-3 absorbs one contended rep per query outright.
 *  - /proc/loadavg + process count are sampled before the run and at
 *    every pass boundary (`env_marks` in the detail file,
 *    load_pre_bench/procs_pre_bench in the main line). Only the
 *    PRE-BENCH load is a contention signal — mid-run loadavg is
 *    dominated by our own executors.
 *  - the sf1 validation suite runs in a FRESH FORKED JVM (same JVM
 *    args + classpath as this one, child mode `--child <dir> <out>`),
 *    so sf0.1 shuffle/codegen/GC debris cannot bleed into the scale
 *    numbers; the child writes a JSON fragment the parent splices in.
 *  - `contended` flags the artifact loudly when any of: pre-bench
 *    loadavg says the machine was already busy, a warm total exceeds
 *    1.5x its cold total (a deterministic suite can only do that under
 *    external load), >20% of queries have a 3-rep spread over 100% of
 *    their median and 0.5 s absolute, two or more queries have a >4x
 *    rep blowup, HOST-NEIGHBOR CPU STEAL exceeds 5% across a pass
 *    (/proc/stat steal jiffies — this box is a VM, and a noisy host
 *    never shows in guest loadavg: an r7 pass ran every query 3-10x
 *    slow at guest load1=3.5), or the cgroup throttled the JVM
 *    (`contention_reasons` lists which fired, tagged by pass).
 * ANN recall@10 vs the exact scan (graft.tools.Recall) is recorded for
 * sf0.1 in the parent and sf1 in the child (VERDICT r6 next #5), and
 * the artifact records whether an ONNX runtime is present so the
 * embedder seam's env constraint is stated per round (next #7).
 */
object Bench {

  /** The sf1 headline suite: scale-representative queries across the
    * relational / events / vector / dedup / curation groups. A subset —
    * the full suite at 10x data would push the per-round bench past its
    * usefulness as a feedback loop; these are the queries whose plans
    * change character with volume (shuffling aggs, windows, banded
    * joins, the distributed component iteration). */
  private val sf1Suite = Seq(
    "q1_agg", "q3_top_revenue", "q_window_rank", "q_salted_agg",
    "ev_hourly", "ev_sessions", "ev_asof",
    "knn_topk", "knn_multiquery_heap", "ann_lsh_join",
    "dedup_exact", "dedup_minhash", "dedup_clusters_stars",
    "text_stats", "text_token_budget_sharded", "pipeline_curate",
    // r6 additions: the new plan shapes whose character changes with
    // volume (broadcast-stats BM25 scan, sharded prefix-sum pack,
    // LUT-projection PQ scan, iterative graph rounds, staged funnel)
    "text_bm25", "text_pack", "ann_pq", "graph_pagerank", "ev_funnel")

  // dedup_jaccard / dedup_embedding are the O(n^2) exact-verification
  // baselines for the MinHash / banded-LSH paths; correctness-gated in
  // Verify, not production operators, so excluded from throughput
  // numbers (the banded production paths ARE benched).
  private val skip = Set("dedup_jaccard", "dedup_embedding")

  private val WarmReps = 3

  // ---- machine-state probes ----

  private def load1(): Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      .split("\\s+")(0).toDouble
    catch { case scala.util.control.NonFatal(_) => -1.0 }

  private def nProcs(): Int =
    Option(new java.io.File("/proc").list())
      .map(_.count(s => s.nonEmpty && s.forall(_.isDigit))).getOrElse(-1)

  /** Cumulative (busy, steal, total) jiffies from /proc/stat. Steal is
    * the blind spot loadavg cannot see: this box is a VM, and a noisy
    * HOST neighbor shows up only as steal time inside the guest — the
    * r7 final-run investigation caught a pass where every query ran
    * 3-10x slow while guest loadavg sat at 3.5 on 32 cpus (the same
    * signature as r6's irreconcilable driver artifact). */
  private def cpuJiffies(): (Long, Long, Long) =
    try {
      val vals = scala.io.Source.fromFile("/proc/stat").getLines().next()
        .split("\\s+").drop(1).map(_.toLong)
      val steal = if (vals.length > 7) vals(7) else 0L
      val idle = vals(3) + (if (vals.length > 4) vals(4) else 0L)
      (vals.sum - idle - steal, steal, vals.sum)
    } catch { case scala.util.control.NonFatal(_) => (-1L, -1L, -1L) }

  /** cgroup v2 CPU throttling counter (throttled_usec) — the OTHER
    * invisible brake: a cpu.max quota squeezes the JVM without any
    * loadavg or steal signal. */
  private def throttledUsec(): Long =
    try scala.io.Source.fromFile("/sys/fs/cgroup/cpu.stat").getLines()
      .find(_.startsWith("throttled_usec"))
      .map(_.split("\\s+")(1).toLong).getOrElse(0L)
    catch { case scala.util.control.NonFatal(_) => -1L }

  private def onnxPresent: Boolean =
    try { Class.forName("ai.onnxruntime.OrtEnvironment"); true }
    catch { case _: Throwable => false }

  // ---- formatting ----

  private def ms(v: Double): String =
    java.lang.String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  private def js(rs: Seq[(String, Double)]): String =
    rs.map { case (k, v) => "\"" + k + "\":" + ms(v) }.mkString("{", ",", "}")

  private def jsArr(ss: Iterable[String]): String =
    ss.map("\"" + _ + "\"").mkString("[", ",", "]")

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // the generated-class cache defaults to 100 entries; an 80-query
      // suite evicts earlier queries' codegen before the warm pass
      // reruns them, re-paying full compilation (measured: text_bm25
      // sf1 8.8 s "warm" vs 2.5 s steady) — r5's "uniform 1.4x
      // warm-pass slowdown" was this, not machine noise
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  private case class Mark(at: String, load: Double, procs: Int,
                          busy: Long, steal: Long, total: Long, thrUs: Long)

  /** One timing sweep over `qs`: cold (1 rep) then warm (3 consecutive
    * reps per query). Failures are tagged "pass:query" and NEVER folded
    * silently into a (misleadingly faster) total; NonFatal only — an
    * OOM or JVM error must abort the run rather than march a poisoned
    * JVM through the rest of the suite. */
  private case class Sweep(cold: Seq[(String, Double)],
                           warm: Seq[(String, Seq[Double])],
                           failures: Seq[String],
                           marks: Seq[Mark]) {
    def warmMed: Seq[(String, Double)] =
      warm.map { case (n, reps) => n -> reps.sorted.apply(reps.size / 2) }
    def warmMin: Seq[(String, Double)] =
      warm.map { case (n, reps) => n -> reps.min }
    def coldTotal: Double = cold.map(_._2).sum
    def warmMedTotal: Double = warmMed.map(_._2).sum
    /** Contention verdicts for this sweep, tagged with `tag`. */
    def contentionReasons(tag: String): Seq[String] = {
      val r = scala.collection.mutable.ArrayBuffer[String]()
      if (coldTotal > 0 && warmMedTotal > 1.5 * coldTotal)
        r += s"$tag:warm_gt_1.5x_cold"
      val spready = warm.count { case (_, reps) =>
        val mx = reps.max; val mn = reps.min
        val med = reps.sorted.apply(reps.size / 2)
        mx - mn > 0.5 && mx - mn > med
      }
      if (warm.nonEmpty && spready.toDouble / warm.size > 0.2)
        r += s"$tag:warm_spread_${spready}of${warm.size}"
      // a single 20x rep blowup is load, not variance — two of them
      // cannot be GC luck
      val outliers = warm.count { case (_, reps) =>
        reps.max > 4 * reps.min && reps.max - reps.min > 2.0
      }
      if (outliers >= 2) r += s"$tag:rep_outliers_$outliers"
      // host-neighbor CPU steal between pass boundaries: invisible to
      // guest loadavg, fatal to wall-clock numbers
      for (Seq(a, b) <- marks.sliding(2) if a.total >= 0 && b.total > a.total) {
        val stealPct = (b.steal - a.steal).toDouble / (b.total - a.total)
        if (stealPct > 0.05)
          r += f"$tag:steal_${b.at}_${stealPct * 100}%.0fpct"
        if (a.thrUs >= 0 && b.thrUs - a.thrUs > 1000000L)
          r += s"$tag:cgroup_throttled_${b.at}"
      }
      r.toSeq
    }
  }

  private def sweep(spark: SparkSession, tag: String,
                    qs: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)],
                    dir: String): Sweep = {
    val failures = scala.collection.mutable.LinkedHashSet[String]()
    val marks = scala.collection.mutable.ArrayBuffer[Mark]()
    def mark(label: String): Unit = {
      val (busy, steal, total) = cpuJiffies()
      marks += Mark(label, load1(), nProcs(), busy, steal, total, throttledUsec())
    }
    def time(pass: String, name: String,
             fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, dir).count() }
      catch { case scala.util.control.NonFatal(_) => failures += s"$pass:$name" }
      (System.nanoTime() - t0) / 1e9
    }
    mark(s"$tag:cold:before")
    val cold = qs.map { case (n, fn) => n -> time(tag, n, fn) }
    mark(s"$tag:cold:after")
    val warm = qs.map { case (n, fn) =>
      n -> Seq.fill(WarmReps)(time(s"${tag}warm", n, fn))
    }
    mark(s"$tag:warm:after")
    Sweep(cold, warm, failures.toSeq, marks.toSeq)
  }

  private def recallJson(spark: SparkSession, dir: String): String =
    try js(graft.tools.Recall.measure(spark, dir)
      .map { case (n, v) => n -> v })
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] recall measurement failed: $e")
      "{}"
    }

  // ---- child mode: the sf1 suite in a fresh JVM ----

  /** Writes a brace-less JSON fragment (sf1 keys) to `out`; the parent
    * splices it into the main line verbatim. */
  private def childMain(dir: String, out: String): Unit = {
    val preLoad = load1(); val preProcs = nProcs()
    val spark = session()
    try SparkEntry.queries.get("knn_topk").foreach(_(spark, dir).count())
    catch { case scala.util.control.NonFatal(_) => () }
    val qs = sf1Suite.flatMap(n => SparkEntry.queries.get(n).map(n -> _))
    val s = sweep(spark, "sf1", qs, dir)
    val recall = if (sys.env.get("SPARK_GRAFT_SKIP_RECALL").contains("1")) "{}"
                 else recallJson(spark, dir)
    val reasons = s.contentionReasons("sf1")
    val detail = s.warm.map { case (n, reps) =>
      "\"" + n + "\":[" + reps.sorted.map(ms).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val marks = s.marks.map { m =>
      s"""{"at":"${m.at}","load1":${ms(m.load)},"procs":${m.procs},"steal":${m.steal},"total":${m.total},"throttled_us":${m.thrUs}}"""
    }.mkString("[", ",", "]")
    val frag =
      s""""sf1_total":${ms(s.coldTotal)},"sf1_warm_total":${ms(s.warmMedTotal)},"sf1_warm_min_total":${ms(s.warmMin.map(_._2).sum)},"sf1_contended":${reasons.nonEmpty},"sf1_contention_reasons":${jsArr(reasons)},"sf1_load_pre":${ms(preLoad)},"sf1_procs_pre":$preProcs,"sf1_failed":${jsArr(s.failures)},"queries_sf1":${js(s.cold)},"queries_sf1_warm":${js(s.warmMed)},"queries_sf1_warm_detail":$detail,"sf1_env_marks":$marks,"recall_sf1":$recall"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      frag.getBytes("UTF-8"))
    spark.stop()
  }

  /** Fork a child JVM with this JVM's own args + classpath, run the sf1
    * suite there, return the JSON fragment. None on any failure. */
  private def forkSf1(dir: String): Option[String] = {
    try {
      val javaBin = s"${sys.props("java.home")}/bin/java"
      val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
        .getInputArguments
      val cp = sys.props("java.class.path")
      val frag = java.nio.file.Files.createTempFile("graft_bench_sf1", ".json")
      val cmd = new java.util.ArrayList[String]()
      cmd.add(javaBin)
      cmd.addAll(jvmArgs)
      cmd.add("-cp"); cmd.add(cp)
      cmd.add("graft.Bench"); cmd.add("--child"); cmd.add(dir)
      cmd.add(frag.toString)
      val log = new java.io.File(
        sys.env.getOrElse("SPARK_GRAFT_SF1_LOG", "/tmp/graft_bench_sf1_child.log"))
      val p = new ProcessBuilder(cmd)
        .redirectErrorStream(true)
        .redirectOutput(log)
        .start()
      val done = p.waitFor(45, java.util.concurrent.TimeUnit.MINUTES)
      if (!done) { p.destroyForcibly(); System.err.println("[bench] sf1 child timed out"); None }
      else if (p.exitValue() != 0) {
        System.err.println(s"[bench] sf1 child exited ${p.exitValue()} (log: $log)")
        None
      } else {
        val s = new String(java.nio.file.Files.readAllBytes(frag), "UTF-8")
        if (s.contains("\"sf1_total\"")) Some(s) else None
      }
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] sf1 fork failed: $e"); None
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.length >= 3 && args(0) == "--child") { childMain(args(1), args(2)); return }

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val preLoad = load1(); val preProcs = nProcs()
    val spark = session()
    // warmup: JIT + codegen + parquet footer caches, untimed
    try SparkEntry.queries.get("knn_topk").foreach(_(spark, sfDir).count())
    catch { case scala.util.control.NonFatal(_) => () }
    val suite = SparkEntry.queries.filter(q => !skip(q._1)).toSeq
    val s = sweep(spark, "sf01", suite, sfDir)
    val recall01 = recallJson(spark, sfDir)

    // sf1 validation in a FRESH JVM. Only triggered when benching the
    // protocol sf0.1 dir so ad-hoc sf0.01 iteration stays fast; gate on
    // the path's BASENAME (endsWith let a trailing slash silently skip
    // scale validation — ADVICE r4 #5).
    var sf1Forked = false
    val sf1Frag: Option[String] =
      if (sys.env.get("SPARK_GRAFT_SKIP_SF1").contains("1")
          || new java.io.File(sfDir).getName != "sf0.1") None
      else {
        val dir = ScaleUp.ensure(spark, sfDir,
          sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft_sf1"))
        // release this JVM's executors/heap before the child starts —
        // the fork exists precisely so the scale numbers see a quiet
        // machine
        spark.stop()
        val forked = forkSf1(dir)
        sf1Forked = forked.isDefined
        forked.orElse {
          // fallback: in-process (old behavior), loudly non-forked
          System.err.println("[bench] sf1 falling back to in-JVM run")
          val sp2 = session()
          val qs = sf1Suite.flatMap(n => SparkEntry.queries.get(n).map(n -> _))
          val c = sweep(sp2, "sf1", qs, dir)
          val reasons = c.contentionReasons("sf1")
          val frag =
            s""""sf1_total":${ms(c.coldTotal)},"sf1_warm_total":${ms(c.warmMedTotal)},"sf1_warm_min_total":${ms(c.warmMin.map(_._2).sum)},"sf1_contended":${reasons.nonEmpty},"sf1_contention_reasons":${jsArr(reasons)},"sf1_failed":${jsArr(c.failures)},"queries_sf1":${js(c.cold)},"queries_sf1_warm":${js(c.warmMed)},"recall_sf1":{}"""
          sp2.stop()
          Some(frag)
        }
      }
    if (!spark.sparkContext.isStopped) spark.stop()

    // ---- verdicts ----
    val reasons = scala.collection.mutable.ArrayBuffer[String]()
    // pre-bench load is the one loadavg sample our own work can't
    // pollute; 32 hot threads on this box is us, 4+ BEFORE we start is
    // someone else
    if (preLoad > 4.0) reasons += s"pre_load_${ms(preLoad)}"
    reasons ++= s.contentionReasons("sf01")
    val sf1Contended = sf1Frag.exists(_.contains("\"sf1_contended\":true"))
    if (sf1Contended) reasons += "sf1"
    val contended = reasons.nonEmpty

    val fragStr = sf1Frag.map("," + _).getOrElse(
      ""","sf1_total":0.000,"sf1_warm_total":0.000,"queries_sf1":{},"queries_sf1_warm":{}""")
    val json =
      s"""{"metric":"total","value":${ms(s.coldTotal)},"unit":"sec","warm_total":${ms(s.warmMedTotal)},"warm_min_total":${ms(s.warmMin.map(_._2).sum)},"warm_reps":$WarmReps,"contended":$contended,"contention_reasons":${jsArr(reasons.toSeq)},"load_pre_bench":${ms(preLoad)},"procs_pre_bench":$preProcs,"sf1_forked":$sf1Forked,"onnx_runtime":$onnxPresent,"failed":${jsArr(s.failures)},"queries":${js(s.cold)},"queries_warm":${js(s.warmMed)},"recall_sf01":$recall01$fragStr,"sf":"$sfDir"}"""
    println(json)
    // the stdout line sits mid-tail between sbt [info] noise; the file
    // artifact is machine-readable without scraping the log tail
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] could not write $out: $e") }
    // rich per-query detail: warm min/med/max triples + machine-state
    // marks — the evidence trail for any contended verdict
    val detail = {
      val triples = s.warm.map { case (n, reps) =>
        "\"" + n + "\":[" + reps.sorted.map(ms).mkString(",") + "]"
      }.mkString("{", ",", "}")
      val marks = s.marks.map { m =>
        s"""{"at":"${m.at}","load1":${ms(m.load)},"procs":${m.procs},"steal":${m.steal},"total":${m.total},"throttled_us":${m.thrUs}}"""
      }.mkString("[", ",", "]")
      s"""{"queries_warm_detail":$triples,"env_marks":$marks}"""
    }
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_detail.json"),
      (detail + "\n").getBytes("UTF-8"))
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] could not write bench_detail.json: $e") }
  }
}
