package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Stage-timing probe for q_assoc_rules (VERDICT r12 #4): separates
  * the basket build (collect_set shuffle), the in-row pair explode +
  * (a,b) count shuffle, and the item-count side so the rewrite's
  * remaining cost can be attributed to a stage instead of guessed.
  *
  * Usage: runMain graft.tools.AssocProbe <sfDir>
  */
object AssocProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "256m")
    // experiment knob: ObjectHashAggregate's sort fallback (default 128
    // in-memory keys) — the basket build has ~50k keys/partition, so it
    // ALWAYS degrades to sort-based aggregation at the default
    sys.env.get("SPARK_GRAFT_OHA_FALLBACK").foreach(v =>
      builder.config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", v))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[assoc] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      val baskets = Tables.load(spark, dir, "lineitem")
        .groupBy(col("l_orderkey").as("ok"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("items"))
        .localCheckpoint(false)
      time("basket build (collect_set shuffle + checkpoint)")(baskets.count())
      val pairs = baskets.select(explode(expr(
        "flatten(transform(items, (x, i) -> " +
          "transform(slice(items, i + 2, size(items)), " +
          "y -> struct(x AS a, y AS b))))")).as("p"))
      time("pair explode only (count)")(pairs.count())
      val rules = pairs
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("n_ab"))
        .where(col("n_ab") >= 2)
      time("pair explode + (a,b) agg")(rules.count())
      val cnt = baskets.select(explode(col("items")).as("pk"))
        .groupBy(col("pk")).agg(count(lit(1)).as("n"))
      time("item counts")(cnt.count())
    }
    spark.stop()
  }
}
