package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
 * is the banded pipeline (no all-pairs anywhere); the join back to the
 * corpus broadcasts automatically when the dup graph is small and
 * shuffle-joins on doc_id when it is not (see the comment in curate).
 */
object Curation {

  /** Curated corpus: (doc_id, pred_lang, quality_r) of surviving docs.
    * `lang = null` keeps all languages. `dupPairs` lets a caller that
    * already materialized the MinHash near-dup graph (an expensive
    * shingle->minhash->band pipeline shared with dedup_clusters /
    * PageRank) feed it in instead of rebuilding it — the rows must be
    * exactly [[Dedup.minhashNearDups]](docs). */
  def curate(docs: DataFrame, minQuality: Double = 0.5,
             lang: String = "en", dupPairs: Option[DataFrame] = None): DataFrame = {
    // FENCE the token-derived columns (r17): the survivor predicate
    // below filters on pred_lang/quality, and predicate pushdown would
    // otherwise inline both expression trees through this projection
    // and below the join — re-tokenizing the corpus inside the pushed
    // Filter (the pipeline_web pathology, plans/r17). The fence keeps
    // the gate ABOVE the join: the join then processes unfiltered
    // stat rows, but they are 3 narrow columns (~20 B/doc) on the
    // already-chosen join side — at any scale cheaper than running the
    // tokenize kernels twice over the corpus.
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val stats = TextAnalysis.stats(docs)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.fence(col("pred_lang")).as("pred_lang"),
        graft.functions.GraftFunctions.fence(col("quality")).as("quality"))
    // (doc_id, component) for docs in near-dup groups only. Join
    // strategy is deliberately LEFT TO SPARK: when the graph fits the
    // broadcast threshold (the union-find path returns a LocalRelation
    // with exact stats) it broadcasts automatically; on a dup-heavy
    // web corpus the dup graph is a large fraction of the corpus and a
    // FORCED broadcast would OOM the executors — the shuffle hash join
    // on doc_id is the correct shape there.
    val comp = Dedup.components(dupPairs.getOrElse(Dedup.minhashNearDups(docs)))
    val langOk =
      if (lang == null) lit(true) else col("pred_lang") === lit(lang)
    stats
      .join(comp, Seq("doc_id"), "left")
      .withColumn("canonical", coalesce(col("component"), col("doc_id")))
      .where(langOk && col("quality") >= minQuality
        && col("doc_id") === col("canonical"))
      .select(col("doc_id"), col("pred_lang"),
        round(col("quality"), 4).as("quality_r"))
  }

  /**
   * URL-rule filtering — the FIRST gate of a web-corpus pipeline
   * (C4/RefinedWeb run URL rules before fetching or extracting
   * anything): rules evaluate in a fixed order, first hit wins, and
   * the row keeps its rejection reason so the filter is auditable
   * (silent drops are how corpora rot). Rules:
   *   1. `blocked_host` — host ends with a blocklisted suffix. The
   *      blocklist is an in-plan literal chain here; at 100 TB a real
   *      blocklist (UT1 et al, ~4M entries) becomes a broadcast semi
   *      join on the registrable domain — same shape as the
   *      decontamination probe;
   *   2. `path_too_deep` — more than `maxDepth` path segments
   *      (calendar/faceted-navigation crawl traps);
   *   3. `tracking_params` — utm_ / session query parameters (dedup
   *      poison: the same page under infinite URL aliases).
   * Pure codegen builtins (regexp + split), no UDF, linear at scale.
   */
  def urlFilter(docs: DataFrame, urlCol: String = "url",
      blockedSuffixes: Seq[String] = Seq(".bad"),
      maxDepth: Int = 5): DataFrame = {
    // normalize before matching: scheme case-insensitive, optional
    // userinfo@ stripped, :port stripped, host lowercased, and '#'
    // terminates host AND path — each is a real-world blocklist bypass
    // otherwise (http://Casino.BAD:8080/, http://casino.bad#frag —
    // ADVICE r14: without '#' in the excluded classes the fragment
    // rode along in the host and dodged the suffix match)
    val host = lower(regexp_extract(col(urlCol),
      "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1))
    val path = regexp_extract(col(urlCol),
      "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+(/[^?#]*)?", 1)
    val depth = size(split(path, "/")) - 1
    val blocked = blockedSuffixes
      .map(sfx => host.endsWith(sfx.toLowerCase))
      .foldLeft(lit(false))(_ || _) // fold: an empty blocklist is legal
    val reason = when(blocked, lit("blocked_host"))
      .when(depth > maxDepth, lit("path_too_deep"))
      .when(col(urlCol).rlike("(?i)[?&](utm_[a-z]+|session)="), lit("tracking_params"))
      .otherwise(lit(null).cast("string"))
    docs.withColumn("reject_reason", reason)
      .withColumn("kept", col("reject_reason").isNull)
  }

  /**
   * Benchmark decontamination: corpus docs sharing >= `minOverlap`
   * distinct word `n`-gram codes with ANY benchmark doc (eval-set
   * leakage check — a standard pre-training hygiene pass). LONG n-grams
   * on purpose: bigrams flag stopword collisions in most of the corpus
   * (measured: 84% of sf0.01 at bigram overlap >= 5); a 5-gram collision
   * is near-certain verbatim leakage, matching the 8-13-gram practice of
   * published pipelines. Returns (doc_id, n_overlap) of contaminated
   * docs.
   *
   * Scale shape: benchmark suites are tiny next to the corpus, so the
   * distinct benchmark n-gram set BROADCASTS; the join is then a
   * map-side hash probe over the corpus n-grams plus one partial-agg
   * groupBy(doc_id) — never an all-pairs doc comparison, never a
   * corpus-sized shuffle of anything but the (doc_id, count) partials.
   */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                    n: Int = 5, minOverlap: Int = 1): DataFrame = {
    val bmCodes = Dedup.ngramCodes(benchmark, n).select("code").distinct()
    Dedup.ngramCodes(corpus, n)
      .join(broadcast(bmCodes), Seq("code"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
      .where(col("n_overlap") >= minOverlap)
  }

  /**
   * MINHASH decontamination — the near-duplicate sibling of
   * [[decontaminate]] (literal n-gram overlap) and
   * [[decontaminateSemantic]] (embedding cosine): corpus docs whose
   * exact shingle Jaccard against ANY benchmark doc reaches
   * `threshold`, with banded-LSH candidate generation so nothing
   * all-pairs ever runs. Returns (doc_id, bench_id, jac_r) — the
   * closest benchmark doc (ties to the lowest id) and the verified
   * Jaccard.
   *
   * Scale shape: the benchmark is the bounded side, so its banded
   * signature keys BROADCAST and the corpus band stream probes them
   * map-side — the only corpus-sized exchanges are the shingle pass
   * (shared with every other minhash consumer) and the
   * candidate-restricted verify, whose cross-join on shingle codes is
   * corpus-shingles x benchmark-shingles per code, never corpus x
   * corpus. Exactness: banding only GENERATES candidates; every
   * emitted pair carries its exact verified Jaccard.
   */
  def decontaminateMinhash(corpus: DataFrame, benchmark: DataFrame,
      threshold: Double = graft.OracleSql.JaccardThreshold): DataFrame = {
    val off = graft.OracleSql.CrossDocOffset
    // ids at/above the offset would silently alias into the benchmark
    // namespace — fail loudly per row, no extra pass
    def guarded(df: DataFrame, side: String) = df.select(
      when(col("doc_id") >= off || col("doc_id") < 0,
        raise_error(concat(lit(s"graft: $side doc_id "), col("doc_id"),
          lit(s" outside [0, $off)"))))
        .otherwise(col("doc_id")).as("doc_id"),
      col("text"))
    val corpusG = guarded(corpus, "corpus")
    val benchOff = guarded(benchmark, "benchmark")
      .select((col("doc_id") + off).as("doc_id"), col("text"))
    // corpus shingles feed signatures AND the verify join: one pass
    val shC = Dedup.checkpointed(Dedup.shingles(corpusG))
    val shB = Dedup.shingles(benchOff)
    val cand = Dedup.bandKeys(Dedup.minhashSignatures(shC))
      .select(col("doc_id").as("d1"), col("band"), col("key"))
      .join(broadcast(Dedup.bandKeys(Dedup.minhashSignatures(shB))
        .select(col("doc_id").as("d2"), col("band"), col("key"))),
        Seq("band", "key"))
      .select("d1", "d2").distinct()
    // cross-only exact Jaccard: intersections from shC x shB on code
    val inter = shC.select(col("doc_id").as("d1"), col("code"))
      .join(shB.select(col("doc_id").as("d2"), col("code")), Seq("code"))
      .join(cand, Seq("d1", "d2"), "left_semi")
      .groupBy("d1", "d2").agg(count(lit(1)).as("i"))
    val szC = shC.groupBy(col("doc_id").as("d1")).agg(count(lit(1)).as("sz1"))
    val szB = shB.groupBy(col("doc_id").as("d2")).agg(count(lit(1)).as("sz2"))
    val jac = inter.join(szC, Seq("d1")).join(broadcast(szB), Seq("d2"))
      .select(col("d1").as("doc_id"), (col("d2") - off).as("bench_id"),
        (col("i").cast("double") / (col("sz1") + col("sz2") - col("i"))).as("j"))
      .where(col("j") >= threshold)
    val w = Window.partitionBy("doc_id").orderBy(desc("j"), asc("bench_id"))
    jac.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("doc_id"), col("bench_id"), round(col("j"), 4).as("jac_r"))
  }

  /**
   * SEMANTIC decontamination — the embedding-space sibling of
   * [[decontaminate]]: corpus vectors whose max cosine similarity to
   * ANY benchmark vector reaches `tau` are flagged as likely eval-set
   * leakage (paraphrase-grade contamination that shares no literal
   * n-gram). Returns (vec_id, bench_id, sim_r) — the closest benchmark
   * member (ties to the lowest id) and the rounded similarity.
   *
   * Scale shape: benchmark suites are BOUNDED (an eval set is
   * thousands of vectors, the corpus is the 100 TB side), so the
   * benchmark rides into the plan as a task constant inside the
   * codegen'd `graft_max_cosine` kernel — the corpus pass is a pure
   * projection + filter: no join, no shuffle, nothing corpus-sized
   * moves, and the filter runs inside whole-stage codegen at scan
   * speed. Per-row cost O(B·d), one compiled loop.
   */
  def decontaminateSemantic(corpus: DataFrame,
      benchmark: Seq[(Long, Seq[Float])], tau: Double): DataFrame = {
    require(tau > -1.0 && tau <= 1.0, s"graft: tau $tau outside (-1, 1]")
    require(benchmark.nonEmpty, "graft: empty benchmark set")
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    corpus
      .select(col("vec_id"),
        call_function("graft_max_cosine",
          graft.functions.GraftFunctions.asVec(col("embedding")),
          array(benchmark.map(b => lit(b._1)): _*),
          array(benchmark.map(b => graft.functions.GraftFunctions.vecLit(b._2)): _*)).as("m"))
      .where(col("m.sim") >= tau)
      .select(col("vec_id"), col("m.bid").as("bench_id"),
        round(col("m.sim"), 4).as("sim_r"))
  }

  /**
   * Per-language token-budget selection (training-mix construction):
   * docs in deterministic doc_id order accumulate until the language's
   * token budget is reached; returns (lang, doc_id, cum_tokens) of the
   * selected prefix. Runs as one running-sum window per language.
   *
   * Scale note (honest): cumulative selection is inherently sequential
   * PER LANGUAGE, so the window partitions by a low-cardinality key —
   * the per-language sort is the cost (Spark externalizes it; no global
   * sort). At 100 TB you shard the budget first — partition by
   * (lang, shard) with budget/shards each — same plan shape, 1000x the
   * parallelism, approximate cut points; the exact form here is the
   * verification baseline for that.
   */
  def tokenBudget(docs: DataFrame, budgetPerLang: Long = 2000L): DataFrame =
    tokenBudgetCounted(
      docs.select(col("lang"), col("doc_id"),
        size(Dedup.tokens(col("text"))).cast("long").as("n_tok")),
      budgetPerLang)

  /** [[tokenBudget]] over PRECOMPUTED counts (lang, doc_id, n_tok) —
    * the seam that lets the budget run on real tokenizer counts (a
    * trained BPE/WordPiece dictionary join, [[Bpe.tokenCounts]])
    * instead of the whitespace proxy: production budgets are specified
    * in model tokens, and the two differ enough to move cut points. */
  def tokenBudgetCounted(counts: DataFrame, budgetPerLang: Long = 2000L): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("cum_tokens", sum(col("n_tok")).over(w))
      .where(col("cum_tokens") <= budgetPerLang)
      .select("lang", "doc_id", "cum_tokens")
  }

  /**
   * Sharded token-budget selection — the 100 TB form of [[tokenBudget]]:
   * docs hash into `shards` buckets per language and each bucket takes
   * an independent budget/shards prefix, so the window partitions by
   * (lang, shard) — restoring parallelism that the low-cardinality
   * `lang` key alone cannot give. Cut points are approximate by design
   * (each shard stops within one doc of its sub-budget; total stays
   * <= budgetPerLang); the exact single-window form is the verification
   * baseline. Returns (lang, doc_id, n_tok).
   */
  /**
   * Temperature-weighted domain mixture sampling (training-mix
   * construction): downsample over-represented domains so the kept
   * corpus follows the alpha-temperature distribution p_dom ∝
   * count^alpha (alpha < 1 flattens toward uniform — the multilingual
   * sampling rule of the published pretraining recipes). The rarest
   * domain is kept in full and every other domain keeps
   * (c_min/c_dom)^(1-alpha) of its docs, decided per doc by the
   * deterministic multiplicative hash shared with the DuckDB oracle
   * (graft.OracleSql.ShardA/ShardP — Spark's murmur `hash()` has no SQL
   * mirror). alpha = 0.5 routes through sqrt, which IEEE guarantees
   * correctly rounded on both engines; other alphas use pow(), where
   * libm rounding may diverge in the last bit (documented — the oracle
   * row pins the sqrt form).
   *
   * Returns the kept (doc_id, domain) rows.
   *
   * Scale shape (100 TB): domain counts are one tiny map-side-combined
   * aggregate; the rate table is domains-sized and BROADCASTS; the keep
   * decision is then a stateless projection over the corpus scan — no
   * corpus shuffle at all.
   */
  def mixtureSample(docs: DataFrame, alpha: Double = 0.5,
                    domainCol: String = "lang", idCol: String = "doc_id"): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"graft: alpha $alpha outside [0, 1]")
    import graft.OracleSql.{ShardA, ShardP}
    val ratio = col("c_min").cast("double") / col("c_dom").cast("double")
    val counts = docs.groupBy(col(domainCol)).agg(count(lit(1)).as("c_dom"))
    val minC = counts.agg(min(col("c_dom")).as("c_min"))
    val rates = counts.crossJoin(broadcast(minC))
      .withColumn("rate",
        if (alpha == 0.5) sqrt(ratio) else pow(ratio, 1.0 - alpha))
      .select(col(domainCol), floor(col("rate") * lit(ShardP.toDouble)).as("keep_below"))
    docs
      .join(broadcast(rates), Seq(domainCol))
      .where(col(idCol) % ShardP * ShardA % ShardP < col("keep_below"))
      .select(col(idCol), col(domainCol))
  }

  /**
   * DSIR-style data selection (Xie et al. 2023, "Data Selection for
   * Language Models via Importance Resampling", arXiv:2302.03169):
   * rank raw-corpus documents by how much their hashed n-gram
   * distribution looks like a TARGET domain sample, then keep the top
   * `k`. Features are the word-bigram shingle codes shared with the
   * dedup family ([[Dedup.shingleOccurrences]] — occurrences, not the
   * distinct set: DSIR is a bag-of-ngrams model), hashed into `buckets`
   * buckets by `code % buckets`.
   *
   * Scoring is the exact-arithmetic monotone stand-in for the paper's
   * log-likelihood ratio (the same discipline as [[TextAnalysis.lmScore]]
   * vs log-perplexity and keywords' integer idf — no ln, no float,
   * cross-engine bit-stable): each bucket carries the add-one-smoothed
   * frequency ratio `w_b = (c_target_b + 1) * 1e6 div (c_raw_b + 1)`,
   * and a document's score is the MEAN bucket weight over its shingle
   * positions (`sum(w_b) div n_shingles` — length-normalized, so long
   * boilerplate cannot outscore a short on-domain doc). Docs with < 2
   * tokens have no shingles and never surface, mirroring the paper's
   * featureless-document drop. Returns the top `k` as
   * (doc_id, n_sh, score_pm), score desc / id asc.
   *
   * Scale shape (100 TB): the target sample is small by definition and
   * its bucket histogram is AT MOST `buckets` rows; the raw histogram is
   * the same size after one map-side-combinable corpus aggregate. The
   * weight table therefore BROADCASTS at any corpus size, scoring is a
   * stateless hash-probe projection over the corpus shingle stream plus
   * one partial-agg groupBy(doc_id), and the final top-k is
   * TakeOrderedAndProject — no corpus-sized shuffle of anything but the
   * (doc_id, partial-sum) rows, no second corpus pass beyond the
   * histogram build.
   */
  def dsirSelect(corpus: DataFrame, target: DataFrame, buckets: Int = 256,
                 k: Int = 100, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    require(buckets > 0 && k > 0,
      s"graft: need positive buckets/k (got $buckets, $k)")
    // One corpus pass only: collapse the shingle stream to per-(doc,
    // bucket) counts FIRST (map-side combinable; multiplicities ride
    // the `c` column), then derive BOTH the raw histogram (sum over
    // docs) and the per-doc score from that compact table. Without
    // pinning, the histogram and the scoring probe each re-ran the
    // tokenizing regex over the whole corpus (the dominant cost —
    // measured 9.0 s warm at sf1 vs ~4.5 s this shape). LAZY
    // localCheckpoint (the semanticDedup lesson): the first consumer
    // materializes the narrow (doc_id, b, c) table, the second reads
    // blocks; eager would pay a separate materialization job.
    val docB = Dedup.shingleOccurrences(corpus, idCol, textCol)
      .select(col("doc_id"), (col("code") % buckets).as("b"))
      .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
      .localCheckpoint(false)
    val tC = Dedup.shingleOccurrences(target, idCol, textCol)
      .select((col("code") % buckets).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("c_t"))
    val rC = docB.groupBy(col("b")).agg(sum(col("c")).as("c_r"))
    val w = rC.join(tC, Seq("b"), "left")
      .select(col("b"),
        expr("(coalesce(c_t, 0L) + 1L) * 1000000L div (c_r + 1L)").as("w_pm"))
    docB.join(broadcast(w), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_sh"), sum(col("c") * col("w_pm")).as("w_sum"))
      .select(col("doc_id"), col("n_sh"),
        expr("w_sum div n_sh").as("score_pm"))
      .orderBy(desc("score_pm"), asc("doc_id"))
      .limit(k)
  }

  def tokenBudgetSharded(docs: DataFrame, budgetPerLang: Long = 2000L,
                         shards: Int = 16): DataFrame = {
    require(shards >= 1 && budgetPerLang >= shards,
      s"graft: budget $budgetPerLang cannot spread over $shards shards")
    val w = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("lang"), col("doc_id"),
        size(Dedup.tokens(col("text"))).cast("long").as("n_tok"))
      // oracle-reproducible multiplicative hash (constants in OracleSql
      // — Spark's murmur hash() has no DuckDB mirror)
      .withColumn("shard",
        col("doc_id") % graft.OracleSql.ShardP * graft.OracleSql.ShardA
          % graft.OracleSql.ShardP % shards)
      .withColumn("cum", sum(col("n_tok")).over(w))
      .where(col("cum") <= budgetPerLang / shards)
      .select("lang", "doc_id", "n_tok")
  }

  /**
   * Per-group WINSORIZATION: clamp `valueCol` to that group's exact
   * [pLo, pHi] quantiles — the standard way to normalize a quality
   * signal whose scale differs by group (per-language quality scores,
   * per-domain perplexities) before a global threshold or mixture
   * weight is applied to it.
   *
   * Quantiles are EXACT via [[Sketch.groupQuantile]] (sketch-bracketed
   * two-pass rank select, never a global sort), so the clamp bounds are
   * reproducible on any engine. The two bound tables are group-sized —
   * they broadcast back onto the corpus; the corpus itself never
   * shuffles beyond the quantile passes. Returns the input plus
   * `qlo`, `qhi` and `<valueCol>_w` (the clamped value, double).
   */
  def winsorizeByGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
                       pLo: Double = 0.1, pHi: Double = 0.9): DataFrame = {
    require(pLo > 0.0 && pLo < pHi && pHi <= 1.0,
      s"graft: need 0 < pLo < pHi <= 1 (got $pLo, $pHi)")
    // ONE shared materialization (r17): each groupQuantile call
    // otherwise localCheckpoints its own copy of df's lineage, so an
    // expensive value column (text_quality_norm's tokenize-derived
    // quality score) was computed THREE times — lo branch, hi branch,
    // and the join-back below. Checkpointing here makes all three read
    // the same materialized narrow rows; the per-call checkpoint
    // inside groupQuantile then just re-persists a projection of this
    // one (cheap). Same algorithm, same exact rank-select values.
    // Storage policy (localCheckpoint under local[*], recomputable
    // persist on a cluster) in [[graft.core.Materialize]].
    val src = graft.core.Materialize(df)
    val lo = Sketch.groupQuantile(src, groupCols, valueCol, pLo)
      .withColumnRenamed("q", "qlo")
    val hi = Sketch.groupQuantile(src, groupCols, valueCol, pHi)
      .withColumnRenamed("q", "qhi")
    src.join(broadcast(lo), groupCols)
      .join(broadcast(hi), groupCols)
      .withColumn(s"${valueCol}_w",
        least(greatest(col(valueCol).cast("double"), col("qlo")), col("qhi")))
  }

  /**
   * Deterministic WEIGHTED sampling without replacement — priority
   * sampling (Duffield/Lund/Thorup, "Priority sampling for estimation
   * of arbitrary subset sums", JACM 2007): each row gets priority
   * `q = u / w` for a uniform u and weight w, and the sample is the k
   * smallest priorities — inclusion probability rises with weight,
   * and any subset-sum estimated from the sample is unbiased.
   *
   * Everything here is INTEGER so the sample is bit-reproducible on
   * any engine: u is the first 60 bits of md5(id) (a public,
   * engine-agnostic uniformizer — Spark/DuckDB built-in hashes don't
   * match each other), w must be a positive integral column, and
   * `q = u div w` with (q, id) ties. Returns the k sampled rows with
   * their priority; the plan is a TakeOrderedAndProject (per-partition
   * heaps + driver merge of k·P candidates), never a global sort.
   */
  def prioritySample(df: DataFrame, k: Int,
                     idCol: String = "doc_id",
                     weightCol: String = "n_chars"): DataFrame = {
    require(k > 0, s"graft: sample size $k must be positive")
    val dt = df.schema(weightCol).dataType
    require(Seq(org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(dt),
      s"graft: weight column $weightCol is $dt; priority sampling needs " +
        "integral weights (scale fractional weights to integers first)")
    df
      .where(col(weightCol) > 0)
      .withColumn("pri",
        expr(s"cast(conv(substring(md5(cast($idCol as string)), 1, 15), 16, 10) as bigint)" +
          s" div cast($weightCol as bigint)"))
      .orderBy(col("pri"), col(idCol))
      .limit(k)
  }
}
