package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.{adjPairs, charSymbols, greedySegment, mergePair, optimalSegmentCount}

/**
 * Distributed byte-pair-encoding merge training and tokenization
 * (Gage 1994, "A New Algorithm for Data Compression"; Sennrich et al.
 * 2016, arXiv:1508.07909) — the canonical subword-tokenizer training
 * step of an LLM data pipeline, beyond the reference's surface (its
 * embedding lane tokenizes with a pre-trained model,
 * reference src/db.rs:101-114; training the tokenizer is the pipeline
 * stage upstream of that).
 *
 * Scale shape — the whole point of the word-frequency formulation:
 * the corpus is touched ONCE (tokenize -> groupBy word, one shuffle,
 * the same explode->count shape as the vocabulary query). Every merge
 * iteration then runs on the WORD-FREQUENCY DICTIONARY — bounded by
 * distinct-word count (~10M rows at web scale), not corpus size
 * (~100 TB). Per iteration: one compiled adjacent-pairs explode over
 * the dictionary, one partial-agg'd sum shuffle, and a LIMIT 1 argmax
 * (TakeOrderedAndProject — one row to the driver; driver state is the
 * k selected merges, never the dictionary). Iteration i recomputes
 * i-1 merge passes over the persisted base dictionary rather than
 * checkpointing per step: the passes are compiled kernels over a
 * vocab-sized cache, and per-step checkpoints would pin k RDD
 * generations across a 128-query suite (the measured r12/r13
 * block-manager-pressure lesson).
 *
 * Determinism (the oracle contract): argmax tie-break is
 * (count DESC, a ASC, b ASC) on raw symbol strings; the merge pass is
 * left-to-right non-overlapping ([[graft.functions.BpeKernel]]), which
 * the DuckDB oracle reproduces with a literal `replace()` over a
 * '|sym|'-marker rendering of each word (delimiter-guarded so a
 * symbol can never match across symbol boundaries).
 */
object Bpe {

  /** One selected merge: adjacent (a, b) -> a+b, chosen at `weight`
    * summed word-frequency occurrences. */
  final case class Merge(a: String, b: String, weight: Long)

  /** A trained tokenizer loaded from a committed store artifact
    * (`tokenizer/v<k>` — [[VectorStore.trainTokenizer]] /
    * [[VectorStore.loadTokenizer]]): the BPE merge list, the optional
    * WordPiece piece vocabulary, and the training provenance a
    * production pipeline pins a dataset to (ONE committed tokenizer
    * across sessions and feeds — re-training per session silently
    * shifts every downstream token count/budget/packing decision).
    * `corpusFp` is the deterministic fingerprint (per-doc xxhash64 folded by xor + modular sum) of the
    * training corpus text; a consumer can compare it against a
    * candidate corpus to detect tokenizing with a stale artifact. */
  final case class TokenizerArtifact(version: Int, merges: Seq[Merge],
      pieces: Seq[String], bpeK: Int, wordpieceV: Int, maxPieceLen: Int,
      corpusFp: Long, nDocs: Long) {

    /** Per-document BPE token counts under the LOADED merges — same
      * dictionary-join shape as [[Bpe.tokenCounts]], no training pass. */
    def tokenCounts(docs: DataFrame, textCol: String = "text",
        idCol: String = "doc_id"): DataFrame =
      Bpe.tokenCounts(docs,
        applyMerges(initState(wordFreq(docs, textCol)), merges),
        textCol, idCol)

    /** Per-document WordPiece greedy token counts under the LOADED
      * piece vocabulary. */
    def wordpieceTokenCounts(docs: DataFrame, textCol: String = "text",
        idCol: String = "doc_id"): DataFrame = {
      require(pieces.nonEmpty,
        s"graft: tokenizer v$version was trained without a WordPiece vocab (wordpieceV=0)")
      Bpe.wordpieceTokenCounts(docs, pieces, textCol, idCol)
    }
  }

  /** Word-frequency dictionary of a corpus column: one corpus pass,
    * one shuffle. Callers iterating merges should persist the result. */
  def wordFreq(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(Dedup.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("w"))

  /** BPE initial state: each word as its single-character symbol
    * array, weight carried. */
  def initState(words: DataFrame): DataFrame =
    words.select(col("word"), charSymbols(col("word")).as("syms"), col("w"))

  /** Frequency-weighted adjacent-pair counts of the current state —
    * the per-iteration aggregation (partial-agg'd; pairs explode is a
    * single compiled pass per word). */
  def pairCounts(state: DataFrame): DataFrame =
    state.select(col("w"), explode(adjPairs(col("syms"))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("w")).as("n"))

  private def topPair(state: DataFrame): Option[Merge] =
    pairCounts(state)
      .orderBy(desc("n"), asc("a"), asc("b")).limit(1)
      .collect().headOption
      .map(r => Merge(r.getString(0), r.getString(1), r.getLong(2)))

  /** Train `k` merges over a word-frequency dictionary. Pass a
    * PERSISTED dictionary — each iteration re-reads it. Stops early if
    * no adjacent pair remains (every word fully merged). */
  def train(words: DataFrame, k: Int): Seq[Merge] =
    train(words, k, checkpointEvery = 0)

  /** Train with BOUNDED LINEAGE for realistic merge counts: iteration
    * i otherwise re-applies i-1 merge passes over the persisted base
    * dictionary — O(k^2) kernel passes across a 30k-merge tokenizer
    * run. With `checkpointEvery` = c > 0 the state is checkpointed
    * every c merges (reliable `checkpoint()` when the session has a
    * checkpoint dir — at cluster scale that is the right call, blocks
    * survive executor loss — else `localCheckpoint`), so a window of
    * at most c uncheckpointed passes is ever re-run and plan depth
    * stays bounded. Superseded localCheckpoint RDDs drop out of scope
    * and the ContextCleaner reclaims their blocks; reliable-checkpoint
    * FILES are only reclaimed when the session sets
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` — the
    * same long-lived-session contract [[Dedup.checkpointed]] already
    * documents; without it a 30k-merge run accumulates k/c dictionary
    * snapshots in the checkpoint dir. The k<=4 suite rows keep c = 0:
    * for tiny k the
    * recompute is cheaper than pinning RDD generations across a
    * 128-query bench suite (the measured r12/r13 block-manager-
    * pressure lesson). Checkpoint-vs-naive value identity is spec-
    * gated (BpeSpec). */
  def train(words: DataFrame, k: Int, checkpointEvery: Int): Seq[Merge] = {
    val merges = ArrayBuffer.empty[Merge]
    var state = initState(words)
    var step = 0
    var done = false
    while (step < k && !done) {
      topPair(state) match {
        case Some(m) =>
          merges += m
          state = applyMerge(state, m)
          step += 1
          if (checkpointEvery > 0 && step % checkpointEvery == 0 && step < k)
            state = Dedup.checkpointed(state)
        case None => done = true
      }
    }
    merges.toSeq
  }

  /** One merge pass over a dictionary state. */
  def applyMerge(state: DataFrame, m: Merge): DataFrame =
    state.withColumn("syms", mergePair(col("syms"), m.a, m.b))

  /** Apply a trained merge list in order. */
  def applyMerges(state: DataFrame, merges: Seq[Merge]): DataFrame =
    merges.foldLeft(state)(applyMerge)

  /** Per-document token counts under a trained dictionary state
    * (`applyMerges(initState(words), merges)` — build it off the SAME
    * persisted word-frequency table the training ran on, so the corpus
    * is scanned exactly twice end to end: word counts + doc-word
    * counts): the corpus re-tokenizes to (doc_id, word) occurrence
    * counts and joins the merged dictionary's per-word symbol count —
    * the dictionary
    * (vocab-sized) is the small side; at fixture scale AQE broadcasts
    * it, at web scale (~10M words) it correctly degrades to a shuffle
    * join on `word`. The corpus is never carried through the merge
    * iterations. */
  def tokenCounts(docs: DataFrame, dictState: DataFrame,
                  textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val dict = dictState
      .select(col("word"), size(col("syms")).cast("long").as("n_sym"))
    occurrenceJoin(docs, dict, textCol, Seq(idCol))
      .groupBy(idCol)
      .agg(sum(col("nw") * col("n_sym")).as("n_tok"))
  }

  /** The shared tail of every tokenizer consumer (token counts,
    * compression eval, budget rows): the corpus re-tokenized to
    * per-key word OCCURRENCE counts, joined to a per-word dictionary
    * `dict`(word, n_sym, ...). The dictionary is the small side — AQE
    * broadcasts it at fixture scale, and at web scale (~10M words) it
    * correctly degrades to a word-keyed shuffle. One home for the
    * shape so the consumers cannot drift. */
  def occurrenceJoin(docs: DataFrame, dict: DataFrame,
                     textCol: String, keyCols: Seq[String]): DataFrame =
    docs.select(keyCols.map(col) :+ explode(Dedup.tokens(col(textCol))).as("word"): _*)
      .groupBy((keyCols :+ "word").map(col): _*)
      .agg(count(lit(1)).as("nw"))
      .join(dict, "word")

  // ---- WordPiece-style greedy tokenization (Wu et al. 2016) ---------
  // The inference-side tokenizer family next to BPE's merge training:
  // a substring vocabulary learned from the same word-frequency
  // dictionary (frequency-weighted multi-char substrings, top-V with a
  // deterministic tie-break, plus every single character as the
  // fallback alphabet so segmentation always terminates without an
  // <unk> collapse), then greedy longest-match-first segmentation as
  // ONE compiled pass per word against the task-constant vocab.

  /** Frequency-weighted multi-char substring counts of a word dict —
    * the vocab-candidate table (vocab-sized x positions, never
    * corpus-sized). */
  def substringCounts(words: DataFrame, maxLen: Int = 4): DataFrame =
    (2 to maxLen).map { l =>
      words.where(length(col("word")) >= l)
        .select(col("w"), explode(expr(
          s"transform(sequence(1, length(word) - $l + 1), i -> substring(word, i, $l))")).as("piece"))
    }.reduce(_ unionByName _)
      .groupBy("piece").agg(sum(col("w")).as("n"))

  /** Learn the piece vocabulary: top-V multi-char substrings by
    * weighted count (ties to the lexicographically smallest piece) +
    * the full single-char alphabet. Driver state is the vocab itself —
    * a model artifact of V + |alphabet| strings, by construction. */
  def pieceVocab(words: DataFrame, maxLen: Int = 4, topV: Int = 24): Seq[String] = {
    val multi = substringCounts(words, maxLen)
      .orderBy(desc("n"), asc("piece")).limit(topV)
      .select("piece").collect().map(_.getString(0)).toSeq
    val chars = words.select(explode(charSymbols(col("word"))).as("c"))
      .distinct().collect().map(_.getString(0)).toSeq
    (multi ++ chars).distinct.sorted
  }

  /** Per-document token counts under greedy longest-match segmentation
    * with `pieces` — same dictionary-join shape as [[tokenCounts]]:
    * the kernel runs once per DISTINCT word, the corpus only pays the
    * (doc_id, word) occurrence join. */
  def wordpieceTokenCounts(docs: DataFrame, pieces: Seq[String],
                           textCol: String = "text",
                           idCol: String = "doc_id"): DataFrame = {
    val dict = wordFreq(docs, textCol)
      .select(col("word"),
        size(greedySegment(col("word"), pieces)).cast("long").as("n_sym"))
    occurrenceJoin(docs, dict, textCol, Seq(idCol))
      .groupBy(idCol)
      .agg(sum(col("nw") * col("n_sym")).as("n_tok"))
  }

  /** Greedy vs OPTIMAL token counts per document under the same piece
    * vocabulary — the exact lower bound the DP kernel
    * ([[graft.functions.OptimalSegmentKernel]], unigram-LM Viterbi
    * with unit costs) puts under greedy longest-match; the gap is the
    * tokenizer-quality signal (a vocab whose greedy counts sit far
    * off its optimal counts segments badly in practice). */
  def greedyVsOptimalCounts(docs: DataFrame, pieces: Seq[String],
                            textCol: String = "text",
                            idCol: String = "doc_id"): DataFrame = {
    val dict = wordFreq(docs, textCol).select(col("word"),
      size(greedySegment(col("word"), pieces)).cast("long").as("g_sym"),
      optimalSegmentCount(col("word"), pieces).cast("long").as("o_sym"))
    occurrenceJoin(docs, dict, textCol, Seq(idCol))
      .groupBy(idCol)
      .agg(sum(col("nw") * col("g_sym")).as("n_greedy"),
           sum(col("nw") * col("o_sym")).as("n_opt"))
  }
}
