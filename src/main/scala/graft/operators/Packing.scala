package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.OracleSql

/**
 * The "last mile" of a training-data pipeline: deterministic sequence
 * packing (documents -> fixed-token-budget training sequences) and
 * hash-sharded corpus export.
 *
 * Packing rule: documents in doc_id order; a document's sequence is
 * tokens_before div seqLen where tokens_before is the token prefix-sum
 * of all earlier documents. This is the obviously-correct sequential
 * rule — the oracle computes it with one global window; the Spark plan
 * computes the SAME integers with a sharded prefix sum that never
 * creates a single-partition window over the corpus.
 */
object Packing {

  /**
   * Distributed token prefix-sum + sequence assignment:
   * (doc_id, n_tok, seq_id).
   *
   * Scale shape: docs shard by id range (`shard = doc_id div span`);
   * per-shard token totals (one row per span-sized id range) collect to
   * the driver where the exclusive running offset is computed — KB-scale
   * metadata, the same documented pattern as the IVF codebook and probe
   * lists (at span=1e6 a 1e11-doc corpus yields 1e5 offset rows). The
   * offsets broadcast-join back and the within-shard window partitions
   * by shard — so the only windows in the plan are parallel over
   * shards, never a global single-partition sort (the r1 anti-pattern,
   * gated inventory-wide in PlanSpec).
   */
  def packAssign(docs: DataFrame,
                 seqLen: Long = OracleSql.PackSeqLen,
                 span: Long = OracleSql.PackSpan,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(seqLen > 0 && span > 0, s"graft: need seqLen/span > 0 (got $seqLen, $span)")
    val t = docs.select(col(idCol).cast("long").as("doc_id"),
        size(Dedup.tokens(col(textCol))).cast("long").as("n_tok"))
      .withColumn("shard", expr(s"doc_id div $span"))
    val totals = t.groupBy("shard")
      .agg(sum(col("n_tok")).as("shard_tok"), min(col("doc_id")).as("min_id"))
      .orderBy("shard").collect()
    // negative ids would split div (Spark truncates, the SQL oracle's
    // // floors) — fail loudly instead of hash-mismatching downstream.
    // The guard is on min(doc_id), not min(shard): ids in (-span, 0)
    // truncate to shard 0 and a shard-level check passes them silently
    // (ADVICE r6 #2).
    require(totals.forall(_.getLong(2) >= 0L),
      "graft: packAssign requires non-negative doc ids")
    var acc = 0L
    val offs = totals.toSeq.map { r =>
      val row = (r.getLong(0), acc); acc += r.getLong(1); row
    }
    val offDf = docs.sparkSession.createDataFrame(offs).toDF("shard", "offset")
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    t.join(broadcast(offDf), "shard")
      .withColumn("tok_before", col("offset") + coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .select(col("doc_id"), col("n_tok"),
        expr(s"tok_before div $seqLen").as("seq_id"))
  }

  /** Per-sequence packing stats: (seq_id, n_docs, n_tokens, first_doc,
    * last_doc). One shuffle on seq_id (map-side combinable). */
  def packSequences(docs: DataFrame,
                    seqLen: Long = OracleSql.PackSeqLen,
                    span: Long = OracleSql.PackSpan,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    packAssign(docs, seqLen, span, idCol, textCol)
      .groupBy("seq_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))

  /** Deterministic export shard of an id: the multiplicative hash both
    * engines compute with identical checked int64 arithmetic
    * (OracleSql.shardSql mirror — Spark's murmur hash() has no SQL
    * reproduction). */
  private def shardExpr(idCol: String, shards: Int) = {
    import OracleSql.{ShardA, ShardP}
    // pmod, not %: Spark's % is sign-preserving, so a negative id would
    // produce a negative shard — a negative partition dir in writeShards
    // and an unprunable key (ADVICE r6 #2). For the non-negative ids the
    // oracle tables carry, pmod == %, so the DuckDB mirror is unchanged.
    expr(s"pmod(pmod($idCol, $ShardP) * $ShardA, $ShardP) % $shards").cast("int")
  }

  /**
   * Per-shard export manifest: (shard, n_docs, n_tokens, fp_xor) where
   * fp_xor is the bit_xor of the documents' rolling-hash fingerprints —
   * an order-independent content checksum, so a re-export can be
   * verified shard-by-shard without re-reading the corpus twice.
   * One map-side-combinable groupBy over `shards` keys.
   */
  def shardStats(docs: DataFrame, shards: Int = OracleSql.ExportShards,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        size(Dedup.tokens(col(textCol))).cast("long").as("n_tok"),
        TextAnalysis.fingerprint(textCol).as("fp"))
      .withColumn("shard", shardExpr("doc_id", shards))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        expr("bit_xor(fp)").as("fp_xor"))

  /**
   * Deterministic train/val/test assignment: the same multiplicative
   * id-hash as sharding, reduced to permille, split on fixed
   * boundaries (800/900 -> 80/10/10). Membership is a pure function of
   * the id — stable under corpus growth, re-runs, and engine changes,
   * which is the property a data split must have (random splits leak
   * across reruns). Returns the input plus a `split` column.
   */
  def splitAssign(docs: DataFrame, trainPm: Int = 800, valPm: Int = 900,
                  idCol: String = "doc_id"): DataFrame = {
    require(0 < trainPm && trainPm < valPm && valPm < 1000,
      s"graft: need 0 < trainPm < valPm < 1000 (got $trainPm, $valPm)")
    import OracleSql.{ShardA, ShardP}
    // pmod for the same reason as shardExpr: with sign-preserving %, a
    // negative id yields a negative permille that ALWAYS classifies as
    // 'train' — silent split leakage instead of a stable assignment
    val pm = expr(s"pmod(pmod($idCol, $ShardP) * $ShardA, $ShardP) % 1000")
    docs.withColumn("split",
      when(pm < trainPm, "train").when(pm < valPm, "val").otherwise("test"))
  }

  /**
   * CLUSTER-AWARE split assignment: like [[splitAssign]], but docs in
   * the same near-duplicate component always land in the same split —
   * the split hash is computed on the COMPONENT label (min doc_id of
   * the group, from [[Dedup.components]]) instead of the doc id, with
   * ungrouped docs keyed by their own id. Plain id-hash splits leak
   * near-duplicates across train/test (the eval set then contains
   * soft copies of training documents — the classic contamination
   * bug); keying the hash by the component closes that leak by
   * construction, not by a post-hoc filter.
   *
   * `components` is (doc_id, component) — the near-dup graph's output,
   * which is sparse (pair-scale, not corpus-scale), so the left join
   * broadcasts at any realistic dup rate. Returns the input plus
   * `grp` (the split key actually hashed) and `split`.
   */
  def splitAssignClustered(docs: DataFrame, components: DataFrame,
                           trainPm: Int = 800, valPm: Int = 900,
                           idCol: String = "doc_id"): DataFrame = {
    val keyed = docs.join(
        components.select(col("doc_id").as(idCol), col("component").as("__c")),
        Seq(idCol), "left")
      .withColumn("grp", coalesce(col("__c"), col(idCol)))
      .drop("__c")
    splitAssign(keyed, trainPm, valPm, "grp")
  }

  /** Per-split manifest: (split, n_docs, n_tokens, fp_xor) — the same
    * order-independent checksum as [[shardStats]], so each split can be
    * verified independently after export. */
  def splitStats(docs: DataFrame, trainPm: Int = 800, valPm: Int = 900,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    splitAssign(docs, trainPm, valPm, idCol)
      .select(col("split"),
        size(Dedup.tokens(col(textCol))).cast("long").as("n_tok"),
        TextAnalysis.fingerprint(textCol).as("fp"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        expr("bit_xor(fp)").as("fp_xor"))

  /**
   * Write the corpus as `shards` hash-sharded parquet directories
   * (shard=NN/ partitions): repartition on the shard key so each output
   * partition holds exactly one shard's rows (one file per shard, no
   * tiny-file fan-out), then partitionBy for partition-pruned reads.
   * Training jobs stream shards independently; the [[shardStats]]
   * manifest verifies each shard after the fact.
   */
  def writeShards(docs: DataFrame, path: String,
                  shards: Int = OracleSql.ExportShards,
                  idCol: String = "doc_id"): Unit =
    docs.withColumn("shard", shardExpr(idCol, shards))
      .repartition(shards, col("shard"))
      // sort within each shard file: parquet row-group min/max stats on
      // the id then prune point/range lookups inside a shard (the
      // shard hash routes; the sort makes the file itself seekable)
      .sortWithinPartitions(col(idCol))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
}
