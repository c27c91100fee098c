package graft
import org.apache.spark.sql.SparkSession
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

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // the generated-class cache defaults to 100 entries; a 67-query
      // suite evicts earlier queries' codegen before the warm pass
      // reruns them, re-paying full compilation (measured: text_bm25
      // sf1 8.8 s "warm" vs 2.5 s steady) — r5's "uniform 1.4x
      // warm-pass slowdown" was this, not machine noise
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: JIT + codegen + parquet footer caches, untimed
    try SparkEntry.queries.get("knn_topk").foreach(_(spark, sfDir).count())
    catch { case scala.util.control.NonFatal(_) => () }
    // dedup_jaccard / dedup_embedding are the O(n^2) exact-verification
    // baselines for the MinHash / banded-LSH paths; they are
    // correctness-gated in Verify, not production operators, so they are
    // excluded from throughput numbers (the banded production paths
    // dedup_minhash / dedup_embedding_lsh ARE benched).
    val skip = Set("dedup_jaccard", "dedup_embedding")
    val suite = SparkEntry.queries.filter(q => !skip(q._1)).toSeq
    // a broken query must be VISIBLE in the output, not silently folded
    // into a (misleadingly faster) total as time-to-throw; failures are
    // tagged with their pass ("sf1:knn_topk") so a scale-only breakage
    // is attributable (ADVICE r4 #5)
    val failures = scala.collection.mutable.LinkedHashSet[String]()
    def run(pass: String,
            qs: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)],
            dir: String): Seq[(String, Double)] = qs.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // NonFatal only (VERDICT r3 What's-wrong #4): an OOM or JVM error
      // must ABORT the run — recording it as a per-query failure would
      // march a poisoned JVM through the rest of the suite and publish
      // totals from it
      try { fn(spark, dir).count() }
      catch { case scala.util.control.NonFatal(_) => failures += s"$pass:$name" }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // two in-JVM passes (VERDICT r2 next-step #10): the COLD pass pays
    // first-touch codegen/JIT/footer caches and is the protocol number
    // BASELINE.md anchors on; the WARM pass is the honest steady-state
    // figure for a long-lived session.
    val cold = run("cold", suite, sfDir)
    val warm = run("warm", suite, sfDir)
    // scale-validation pass (VERDICT r3 next #3): a 10x dataset derived
    // from the protocol dir by keyed replication (ScaleUp), run over the
    // sf1 headline suite. Opt out with SPARK_GRAFT_SKIP_SF1=1; only
    // triggered when benching the protocol sf0.1 dir so ad-hoc sf0.01
    // iteration stays fast. Gate on the path's BASENAME — endsWith let a
    // trailing slash silently skip scale validation (ADVICE r4 #5).
    // cold AND warm sf1 passes (VERDICT r5 next #2): r4's sf1 numbers
    // ran after ~980 s of dedup queries had warmed the JVM, r5's ran
    // cold, and three relational queries moved 4-8x between them —
    // recording both passes separates JIT/codegen warm-up from real plan
    // regressions at the validation scale factor.
    val (sf1, sf1w) =
      if (sys.env.get("SPARK_GRAFT_SKIP_SF1").contains("1")
          || new java.io.File(sfDir).getName != "sf0.1") (Nil, Nil)
      else {
        val dir = ScaleUp.ensure(spark, sfDir,
          sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft_sf1"))
        val qs = sf1Suite.flatMap(n => SparkEntry.queries.get(n).map(n -> _))
        (run("sf1", qs, dir), run("sf1warm", qs, dir))
      }
    // The whole JSON line must fit the driver's ~2000-char output tail
    // or the round's bench publishes unparsed (every r1-r4 BENCH_r*.json
    // carried "parsed": null — the three full-precision per-query maps
    // pushed the line past 5 KB). Millisecond precision and totals-only
    // for the warm pass keep the line ~1.7 KB; the warm per-query map
    // adds no information the cold map + warm_total don't.
    def ms(v: Double): String =
      java.lang.String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def js(rs: Seq[(String, Double)]) =
      rs.map { case (k, v) => "\"" + k + "\":" + ms(v) }.mkString("{", ",", "}")
    val coldTotal = cold.map(_._2).sum
    val warmTotal = warm.map(_._2).sum
    val sf1Total = sf1.map(_._2).sum
    val sf1WarmTotal = sf1w.map(_._2).sum
    val failed = failures.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":${ms(coldTotal)},"unit":"sec","warm_total":${ms(warmTotal)},"sf1_total":${ms(sf1Total)},"sf1_warm_total":${ms(sf1WarmTotal)},"failed":$failed,"queries":${js(cold)},"queries_sf1":${js(sf1)},"queries_sf1_warm":${js(sf1w)},"sf":"$sfDir"}"""
    println(json)
    // ALSO write the JSON to a file (VERDICT r5 next #3): the stdout
    // line sits mid-tail between sbt [info] noise and every round's
    // BENCH_r*.json has carried "parsed": null — the file artifact is
    // machine-readable without scraping the log tail
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] could not write $out: $e") }
    spark.stop()
  }
}
