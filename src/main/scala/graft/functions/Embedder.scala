package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/**
 * Pluggable text -> embedding hook (reference `add`/`search` embed
 * documents with a fastembed model at insert/query time,
 * src/db.rs:101-114, 197-213). Model inference is an integration point,
 * not an engine operator; the engine-side contract is just a Column
 * transform ARRAY<FLOAT> <- STRING.
 *
 * [[HashingEmbedder]] is the deterministic built-in: feature-hashing
 * bag-of-words (token code mod d, l2-normalized) — the classic
 * "hashing trick". It is a real, usable baseline (exact same shape a
 * model UDF would have) and is exactly reproducible in the SQL oracle.
 * A model-backed implementation would wrap an ONNX session in
 * `mapPartitions` with a lazy per-executor singleton.
 */
trait Embedder {
  def dim: Int
  def embed(text: Column): Column
}

case class HashingEmbedder(dim: Int = 64) extends Embedder {

  /** integer term counts per hashed dimension. */
  def counts(text: Column): Column = {
    val codes = transform(Dedup.tokens(text), w => Dedup.wcode(w) % dim)
    transform(sequence(lit(0), lit(dim - 1)),
      j => size(filter(codes, c => c === j)).cast("long"))
  }

  override def embed(text: Column): Column = {
    val c = counts(text)
    val norm = sqrt(aggregate(c, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    transform(c, x =>
      when(norm > 0.0, x.cast("double") / norm).otherwise(0.0).cast("float"))
  }
}
