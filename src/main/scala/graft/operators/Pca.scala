package graft.operators

import org.apache.spark.mllib.linalg.{Vectors => MlVectors}
import org.apache.spark.mllib.linalg.distributed.RowMatrix
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.call_function

import graft.functions.ProjectVector

/**
 * PCA fit + projection (reference pipeline: src/decomposition.rs:88-102,
 * apply: src/db.rs:456-471). Spark-first design:
 *
 *  - fit: distributed Gramian via RowMatrix.computePrincipalComponents
 *    (covariance is d x d = tiny on the driver; the data pass is the
 *    only distributed cost — O(N*d^2) map-side outer products).
 *  - apply: [[ProjectVector]] expression with the basis/means embedded
 *    as plan constants (serialized with the task closure — a broadcast
 *    of ~d*k doubles, no join, no shuffle).
 *
 * Divergence from reference (documented, SURVEY §2 #27): we center with
 * the global means everywhere; the reference re-centers per-file during
 * rewrite. Global means are the statistically correct choice.
 */
object Pca {

  case class Model(basis: Array[Array[Double]], means: Array[Double]) {
    def k: Int = if (basis.isEmpty) 0 else basis(0).length
    def d: Int = means.length
  }

  /** Fit a k-dim PCA over an ARRAY<FLOAT> column. */
  def fit(df: DataFrame, vecCol: String, k: Int): Model = {
    val rows = df.select(vecCol).rdd
      .map(r => MlVectors.dense(r.getSeq[Float](0).map(_.toDouble).toArray))
    val mat = new RowMatrix(rows)
    val pc = mat.computePrincipalComponents(k) // d x k, column-major
    val means = mat.computeColumnSummaryStatistics().mean.toArray
    val d = means.length
    val basis = Array.tabulate(d, k)((i, j) => pc(i, j))
    Model(basis, means)
  }

  /** Register the fitted projection as a session function and return a
    * Column applying it. */
  def projector(spark: SparkSession, model: Model, name: String = "graft_project_fitted"): Column => Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, e => ProjectVector(e.head, model.basis, model.means), "built-in")
    (c: Column) => call_function(name, c)
  }

  /** Project a single query vector driver-side (search path parity). */
  def projectOne(model: Model, v: Seq[Float]): Array[Float] = {
    val d = model.d
    require(v.length == d, s"graft: projection dim mismatch (${v.length} vs $d)")
    val centered = Array.tabulate(d)(i => v(i).toDouble - model.means(i))
    Array.tabulate(model.k) { j =>
      var s = 0.0; var i = 0
      while (i < d) { s += centered(i) * model.basis(i)(j); i += 1 }
      s.toFloat
    }
  }
}
