package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bpe, VectorStore}

/** The versioned tokenizer artifact (VERDICT r13 next #4): train ->
  * commit tokenizer/v<k> -> load across store instances (the
  * cross-session shape), version time travel, vacuum reclaim, and
  * load-path value identity against an inline-trained pipeline. */
class TokenizerStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(extra: String = "") = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank" + extra),
    (2L, "the lazy dog sleeps while the quick fox runs through the brown field" + extra),
    (3L, "rivers run quick and brown under the old stone bridge every day" + extra))
    .toDF("doc_id", "text")

  test("train commits tokenizer/v0; a fresh store instance loads identical state") {
    val root = Files.createTempDirectory("graft-tok").toString
    val store = new VectorStore(spark, root)
    assert(store.tokenizerVersions.isEmpty)
    intercept[IllegalArgumentException] { store.loadTokenizer() }
    val v = store.trainTokenizer(docs(), bpeK = 4, wordpieceV = 8)
    assert(v == 0)
    assert(store.tokenizerVersions == Seq(0))
    // the cross-session shape: a NEW store object over the same root
    val tok = new VectorStore(spark, root).loadTokenizer()
    assert(tok.version == 0)
    assert(tok.bpeK == 4 && tok.wordpieceV == 8 && tok.maxPieceLen == 4)
    assert(tok.nDocs == 3)
    // merges equal a direct train over the same corpus
    val words = Bpe.wordFreq(docs()).persist()
    try {
      assert(tok.merges == Bpe.train(words, 4))
      assert(tok.pieces == Bpe.pieceVocab(words, 4, 8))
    } finally words.unpersist(blocking = false)
    // fingerprint is deterministic: retraining the same corpus agrees
    val store2 = new VectorStore(spark,
      Files.createTempDirectory("graft-tok2").toString)
    store2.trainTokenizer(docs(), bpeK = 4, wordpieceV = 8)
    assert(store2.loadTokenizer().corpusFp == tok.corpusFp)
    // and a different corpus does not
    val store3 = new VectorStore(spark,
      Files.createTempDirectory("graft-tok3").toString)
    store3.trainTokenizer(docs(" shifted"), bpeK = 4, wordpieceV = 8)
    assert(store3.loadTokenizer().corpusFp != tok.corpusFp)
  }

  test("fingerprint detects even-multiplicity duplicate swaps (xor alone self-cancels)") {
    // [A, A] vs [B, B]: xxhash64(A)^xxhash64(A) == 0 == xxhash64(B)^xxhash64(B)
    // and the doc counts match — only the modular-sum fold separates them
    def fpOf(texts: Seq[String]): Long = {
      val store = new VectorStore(spark,
        Files.createTempDirectory("graft-tok-fp").toString)
      store.trainTokenizer(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
        bpeK = 1, wordpieceV = 0)
      store.loadTokenizer().corpusFp
    }
    assert(fpOf(Seq("alpha beta", "alpha beta"))
      != fpOf(Seq("gamma delta", "gamma delta")))
  }

  test("loaded artifact tokenizes identically to the inline pipeline (BPE + WordPiece)") {
    val store = new VectorStore(spark,
      Files.createTempDirectory("graft-tok-id").toString)
    store.trainTokenizer(docs(), bpeK = 4, wordpieceV = 8)
    val tok = store.loadTokenizer()
    val words = Bpe.wordFreq(docs()).persist()
    try {
      val inlineBpe = Bpe.tokenCounts(docs(),
        Bpe.applyMerges(Bpe.initState(Bpe.wordFreq(docs())), Bpe.train(words, 4)))
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      val loadedBpe = tok.tokenCounts(docs()).orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(loadedBpe.toSeq == inlineBpe.toSeq)
      val inlineWp = Bpe.wordpieceTokenCounts(docs(), Bpe.pieceVocab(words, 4, 8))
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      val loadedWp = tok.wordpieceTokenCounts(docs()).orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(loadedWp.toSeq == inlineWp.toSeq)
    } finally words.unpersist(blocking = false)
  }

  test("retrain commits v1; time travel to v0 until vacuum reclaims it") {
    val store = new VectorStore(spark,
      Files.createTempDirectory("graft-tok-ver").toString)
    store.trainTokenizer(docs(), bpeK = 2, wordpieceV = 0)
    val v1 = store.trainTokenizer(docs(), bpeK = 4, wordpieceV = 8)
    assert(v1 == 1)
    assert(store.tokenizerVersions == Seq(0, 1))
    // newest by default; history loadable by version
    assert(store.loadTokenizer().bpeK == 4)
    val old = store.loadTokenizer(0)
    assert(old.bpeK == 2 && old.merges.size == 2 && old.pieces.isEmpty)
    // a version trained without wordpiece refuses the wordpiece leg loudly
    intercept[IllegalArgumentException] { old.wordpieceTokenCounts(docs()) }
    // vacuum(0) reclaims the superseded version, keeps the current one
    store.vacuum(0L)
    assert(store.tokenizerVersions == Seq(1))
    val e = intercept[IllegalArgumentException] { store.loadTokenizer(0) }
    assert(e.getMessage.contains("vacuumed"))
    assert(store.loadTokenizer().bpeK == 4)
  }
}
