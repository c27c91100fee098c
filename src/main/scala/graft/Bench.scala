package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: JIT + codegen + parquet footer caches, untimed
    try SparkEntry.queries.get("knn_topk").foreach(_(spark, sfDir).count())
    catch { case _: Throwable => () }
    // dedup_jaccard / dedup_embedding are the O(n^2) exact-verification
    // baselines for the MinHash / banded-LSH paths; they are
    // correctness-gated in Verify, not production operators, so they are
    // excluded from throughput numbers (the banded production paths
    // dedup_minhash / dedup_embedding_lsh ARE benched).
    val skip = Set("dedup_jaccard", "dedup_embedding")
    val suite = SparkEntry.queries.filter(q => !skip(q._1)).toSeq
    // a broken query must be VISIBLE in the output, not silently folded
    // into a (misleadingly faster) total as time-to-throw
    val failures = scala.collection.mutable.LinkedHashSet[String]()
    def pass(): Seq[(String, Double)] = suite.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case _: Throwable => failures += name }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // two in-JVM passes (VERDICT r2 next-step #10): the COLD pass pays
    // first-touch codegen/JIT/footer caches and is the protocol number
    // BASELINE.md anchors on; the WARM pass is the honest steady-state
    // figure for a long-lived session.
    val cold = pass()
    val warm = pass()
    def js(rs: Seq[(String, Double)]) =
      rs.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val coldTotal = cold.map(_._2).sum
    val warmTotal = warm.map(_._2).sum
    val failed = failures.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$coldTotal,"unit":"sec","warm_total":$warmTotal,"failed":$failed,"queries":${js(cold)},"queries_warm":${js(warm)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
