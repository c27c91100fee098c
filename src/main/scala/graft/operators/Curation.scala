package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * End-to-end corpus curation — the composed job a training-data pipeline
 * actually runs over a raw crawl: language filter + quality floor +
 * near-duplicate canonicalization, in ONE DataFrame plan.
 *
 * Policy (deterministic, oracle-checkable):
 *  - near-dup groups come from the MinHash-LSH pipeline
 *    ([[Dedup.minhashNearDups]] -> [[Dedup.components]]); each group's
 *    CANONICAL copy is its min doc_id (the component label), docs in no
 *    group are their own canonical;
 *  - a doc survives iff it passes the language + quality predicates AND
 *    is its group's canonical copy. A group whose canonical fails the
 *    predicates contributes nothing (canonical-copy policy: near-dups of
 *    a rejected document are rejected content too — documented, the
 *    alternative "promote the next dup" needs a second ranking pass).
 *
 * Scale shape: stats are a pure projection over the scan; the dedup leg
 * is the banded pipeline (no all-pairs anywhere); the final join is
 * dup-graph-sized (tiny vs corpus) and broadcast.
 */
object Curation {

  /** Curated corpus: (doc_id, pred_lang, quality_r) of surviving docs.
    * `lang = null` keeps all languages. */
  def curate(docs: DataFrame, minQuality: Double = 0.5,
             lang: String = "en"): DataFrame = {
    val stats = TextAnalysis.stats(docs)
      .select(col("doc_id"), col("pred_lang"), col("quality"))
    // (doc_id, component) for docs in near-dup groups only — minuscule
    // next to the corpus, hence broadcast on the join back
    val comp = Dedup.components(Dedup.minhashNearDups(docs))
    val langOk =
      if (lang == null) lit(true) else col("pred_lang") === lit(lang)
    stats
      .join(broadcast(comp), Seq("doc_id"), "left")
      .withColumn("canonical", coalesce(col("component"), col("doc_id")))
      .where(langOk && col("quality") >= minQuality
        && col("doc_id") === col("canonical"))
      .select(col("doc_id"), col("pred_lang"),
        round(col("quality"), 4).as("quality_r"))
  }
}
