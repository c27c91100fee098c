package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * General iterative graph processing beyond connected components:
 * integer-exact PageRank over an undirected pair list (e.g. the
 * near-dup graph — rank then identifies the CENTER documents of
 * duplicate families, a useful canonicalization signal alongside
 * [[Dedup.components]]' min-id rule).
 *
 * The recurrence is INTEGER end to end:
 *   r_0(v)    = 1,000,000
 *   r_{t+1}(v) = 150,000 + (850 * sum_{u->v} (r_t(u) div deg(u))) div 1000
 * Integer division at both steps makes every iteration bit-reproducible
 * on any engine — no float accumulation order to drift — so a SQL
 * oracle can replay the exact ranks. Undirected pairs mean deg >= 1
 * for every node (no dangling-mass term needed).
 *
 * Plan shape per iteration: one equi-join of the rank table against
 * the (checkpointed) edge list + one map-side-combinable sum — the
 * [[Dedup.componentsStars]] shuffle family; ranks checkpoint each
 * round so lineage stays flat at any iteration count.
 */
object Graph {

  val PrScale = 1000000L

  /**
   * `iters` rounds of integer PageRank over undirected pairs (d1, d2).
   * Returns (node, pr) — pr at the 1e6 scale.
   */
  def pagerankInt(pairs: DataFrame, iters: Int = 10): DataFrame = {
    require(iters >= 0, s"graft: negative iterations ($iters)")
    val edges = Dedup.checkpointed(
      pairs.select(col("d1").as("u"), col("d2").as("v"))
        .unionByName(pairs.select(col("d2").as("u"), col("d1").as("v")))
        .distinct())
    val deg = edges.groupBy("u").agg(count(lit(1)).as("deg"))
    var rank = deg.select(col("u").as("node"), lit(PrScale).as("pr"))
    for (_ <- 0 until iters) {
      val contrib = edges
        .join(deg, "u")
        .join(rank.withColumnRenamed("node", "u"), "u")
        .select(col("v").as("node"), expr("pr div deg").as("c"))
        .groupBy("node")
        .agg(sum(col("c")).as("s"))
      rank = Dedup.checkpointed(
        contrib.select(col("node"),
          (lit(150000L) + expr("850 * s div 1000")).as("pr")))
    }
    rank
  }
}
