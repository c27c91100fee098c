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
  /**
   * `iters` rounds over undirected pairs (d1, d2) -> (node, pr).
   * Below `broadcastThreshold` edges the whole iteration runs on the
   * driver (the [[Dedup.components]] union-find analogue: a ten-round
   * join pipeline over a thousand edges is all fixed cost); the
   * distributed branch — equivalence-tested against the driver loop —
   * takes over beyond it. The integer recurrence is identical in both.
   */
  def pagerankInt(pairs: DataFrame, iters: Int = 10,
                  broadcastThreshold: Long = 1000000L): DataFrame = {
    require(iters >= 0, s"graft: negative iterations ($iters)")
    val raw = pairs.select(col("d1").as("u"), col("d2").as("v"))
      .unionByName(pairs.select(col("d2").as("u"), col("d1").as("v")))
      .distinct()
    // width scales with the graph, floor 2 — ten rounds over a fixture
    // graph must not pay 32-task fixed costs per round (the
    // roundPartitions lesson from the component iterations); edges
    // pre-partition on the join key ONCE and localCheckpoint preserves
    // that partitioning, so each round shuffles only the rank side
    val nEdges = raw.count()
    if (nEdges <= broadcastThreshold)
      return pagerankLocal(pairs.sparkSession, raw, iters)
    val width = math.max(2L, math.min(
      pairs.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toLong,
      nEdges / 1000000L + 1)).toInt
    val edges = Dedup.checkpointed(raw.repartition(width, col("u")))
    val deg = edges.groupBy("u").agg(count(lit(1)).as("deg"))
    var rank = deg.select(col("u").as("node"), lit(PrScale).as("pr"))
    for (t <- 1 to iters) {
      val contrib = edges
        .join(deg, "u")
        .join(rank.withColumnRenamed("node", "u"), "u")
        .select(col("v").as("node"), expr("pr div deg").as("c"))
        .groupBy("node")
        .agg(sum(col("c")).as("s"))
      val next = contrib.select(col("node"),
        (lit(150000L) + expr("850 * s div 1000")).as("pr"))
      // checkpoint every third round: lineage stays shallow (<= 3 joins
      // deep) while the per-round eager-materialization job — the round
      // iteration's fixed cost — is paid a third as often
      rank = if (t % 3 == 0 || t == iters) Dedup.checkpointed(next) else next
    }
    rank
  }

  /** Driver-side branch: the same integer recurrence over collected
    * edges (KB-to-MB scale below the threshold — the graph, not the
    * corpus, and near-dup graphs are sparse). */
  private def pagerankLocal(spark: org.apache.spark.sql.SparkSession,
                            edges: DataFrame, iters: Int): DataFrame = {
    import spark.implicits._
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg: Map[Long, Long] =
      es.groupBy(_._1).map { case (u, a) => (u, a.length.toLong) }
    var rank: Map[Long, Long] = deg.map { case (u, _) => (u, PrScale) }
    for (_ <- 1 to iters) {
      val s = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((u, v) <- es) s(v) += rank(u) / deg(u)
      rank = s.map { case (n, sm) => (n, 150000L + 850L * sm / 1000L) }.toMap
    }
    rank.toSeq.toDF("node", "pr")
  }
}
