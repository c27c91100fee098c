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
    // threshold check on the PAIR count (each pair = 2 directed edges):
    // the driver branch must decide BEFORE building the distributed
    // union+distinct — the old shape counted the distinct directed
    // edges and then collected them, executing the distinct shuffle
    // twice per call just to hand the driver a list it can dedup itself
    val nPairs = pairs.count()
    if (2 * nPairs <= broadcastThreshold)
      return pagerankLocal(pairs.sparkSession, pairs, iters)
    val raw = pairs.select(col("d1").as("u"), col("d2").as("v"))
      .unionByName(pairs.select(col("d2").as("u"), col("d1").as("v")))
      .distinct()
    // width scales with the graph, floor 2 — ten rounds over a fixture
    // graph must not pay 32-task fixed costs per round (the
    // roundPartitions lesson from the component iterations); edges
    // pre-partition on the join key ONCE and localCheckpoint preserves
    // that partitioning, so each round shuffles only the rank side
    val nEdges = raw.count()
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

  /**
   * Per-node triangle counts over an undirected pair list (d1, d2):
   * (node, tri) for every node that closes at least one triangle.
   * Self-loops and duplicate/reversed pairs are normalized away first.
   *
   * Scale shape — degree-ordered orientation (the standard
   * wedge-counting bound): every canonical edge is directed from its
   * lower-(degree, id) endpoint to the higher, so a node's out-degree
   * is O(sqrt(m)) on any graph and the wedge self-join
   * (u→v, u→w) never explodes on a hub the way a naive edge self-join
   * does (a degree-D hub contributes D² wedges undirected but only
   * out-deg² oriented). Each triangle has exactly ONE wedge whose
   * closing edge (v→w) respects the orientation, so the semi-join of
   * wedges against the oriented edge list counts each triangle exactly
   * once — no distinct, no /3 fixups, no cartesian anywhere. Two
   * shuffles (degree join, wedge build) + one equi-join; hot wedge
   * sources are AQE-splittable equi-join skew.
   *
   * Two tempting "optimizations" MEASURED SLOWER here (sf0.1
   * co-purchase graph, 1.2M edges, warm): broadcasting the closing
   * edge list for the semi-join (8.3 s -> 16 s — the broadcast build
   * is a separate job that recomputes the whole oriented chain, while
   * the shuffled semi shares the scan and the src exchange inside one
   * job), and localCheckpoint-pinning edges/oriented (8.3 s -> 17 s —
   * the RDD barrier severs whole-stage fusion on every consumer, which
   * costs more than recomputing one cheap shuffle). The all-shuffle
   * shape is also the only one that scales past driver memory, so it
   * is the single code path.
   */
  def triangles(pairs: DataFrame): DataFrame = {
    // canonical undirected edge set: (a < b), self-loops dropped.
    // NOT checkpointed: pinning here materializes the edge RDD and
    // every downstream join loses whole-stage fusion with the scan —
    // measured 2x SLOWER than recomputing the distinct (the multi-
    // consumer checkpoint lesson cuts the other way when the producer
    // is one cheap shuffle inside a codegen'd pipeline)
    val edges = pairs
      .select(least(col("d1"), col("d2")).as("a"),
              greatest(col("d1"), col("d2")).as("b"))
      .where(col("a") < col("b"))
      .distinct()
    val deg = edges.select(col("a").as("node"))
      .unionAll(edges.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient by (deg, id): src = lower endpoint in that order
    val withDeg = edges
      .join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "da"), "a")
      .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "db"), "b")
    val oriented = withDeg.select(
      when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("src"), col("b").as("dst"),
               col("da").as("sdeg"), col("db").as("ddeg")))
        .otherwise(
          struct(col("b").as("src"), col("a").as("dst"),
                 col("db").as("sdeg"), col("da").as("ddeg")))
        .as("e"))
      .select(col("e.src"), col("e.dst"), col("e.ddeg"))
    // wedges (u→v, u→w) with v before w in the orientation order; the
    // closing edge of a triangle is then always oriented v→w
    val l = oriented.select(col("src"), col("dst").as("v"), col("ddeg").as("vdeg"))
    val r = oriented.select(col("src"), col("dst").as("w"), col("ddeg").as("wdeg"))
    val wedges = l.join(r, Seq("src"))
      .where(col("vdeg") < col("wdeg") ||
        (col("vdeg") === col("wdeg") && col("v") < col("w")))
      .select(col("src").as("u"), col("v"), col("w"))
    val closing = oriented.select(col("src").as("v"), col("dst").as("w"))
    val tris = wedges.join(closing, Seq("v", "w"), "left_semi")
    tris.select(col("u").as("node"))
      .unionAll(tris.select(col("v").as("node")))
      .unionAll(tris.select(col("w").as("node")))
      .groupBy("node").agg(count(lit(1)).as("tri"))
  }

  /** Driver-side branch: the same integer recurrence over collected
    * PAIRS (KB-to-MB scale below the threshold — the graph, not the
    * corpus, and near-dup graphs are sparse). One collect of the
    * undirected pair list; direction expansion, dedup, and the
    * iteration all run on primitive index arrays — the boxed-Map
    * version of this loop was the entire cost of the sf1 pagerank
    * bench row (5.9 s/rep, rep spread 15 ms: pure repeated driver CPU,
    * ~4.5M boxed hash operations per iteration). */
  private def pagerankLocal(spark: org.apache.spark.sql.SparkSession,
                            pairs: DataFrame, iters: Int): DataFrame = {
    import spark.implicits._
    val ps = pairs.select(col("d1"), col("d2")).collect()
    // node index: long id -> dense int
    val idx = new java.util.HashMap[Long, Integer]()
    def id(x: Long): Int = {
      val got = idx.get(x)
      if (got != null) got.intValue()
      else { val i = idx.size(); idx.put(x, i); i }
    }
    // directed edges, deduped on the packed (u, v) index pair — the
    // driver-side equivalent of the distributed branch's
    // union-both-directions + DISTINCT (pair lists may carry either
    // orientation; a self-pair yields the single directed self-edge
    // in both shapes)
    val seen = new java.util.HashSet[Long]()
    val us = new scala.collection.mutable.ArrayBuilder.ofInt
    val vs = new scala.collection.mutable.ArrayBuilder.ofInt
    for (r <- ps) {
      val a = id(r.getLong(0)); val b = id(r.getLong(1))
      val e1 = a.toLong << 32 | (b.toLong & 0xffffffffL)
      if (seen.add(e1)) { us += a; vs += b }
      val e2 = b.toLong << 32 | (a.toLong & 0xffffffffL)
      if (seen.add(e2)) { us += b; vs += a }
    }
    val ua = us.result(); val va = vs.result()
    val n = idx.size()
    val deg = new Array[Long](n)
    var i = 0
    while (i < ua.length) { deg(ua(i)) += 1; i += 1 }
    var rank = Array.fill(n)(PrScale)
    for (_ <- 1 to iters) {
      val s = new Array[Long](n)
      i = 0
      while (i < ua.length) { s(va(i)) += rank(ua(i)) / deg(ua(i)); i += 1 }
      var j = 0
      val next = new Array[Long](n)
      while (j < n) { next(j) = 150000L + 850L * s(j) / 1000L; j += 1 }
      rank = next
    }
    val ids = new Array[Long](n)
    idx.forEach((k, v) => ids(v.intValue()) = k)
    ids.indices.map(i2 => (ids(i2), rank(i2))).toDF("node", "pr")
  }
}
