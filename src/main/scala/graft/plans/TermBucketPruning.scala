package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{IntegerType, StringType}

/**
 * Static term-bucket partition pruning for PLAIN SQL over a registered
 * posting index (VERDICT r13 next #7 — the SQL twin of the facade-side
 * probe in [[graft.operators.Search.phraseMatchIndexed]]).
 *
 * The index's layout key is `tb = crc32(tok) % buckets`
 * ([[graft.operators.Search.termBucket]]). The facade computes the
 * `tb IN (...)` list on the driver before planning, so its scan lists
 * only the phrase's bucket directories. A SQL user writing
 *
 *   SELECT ... FROM graft_postings WHERE tok IN ('order', 'fast')
 *
 * got the row-group-pushed `tok IN` filter but NO partition pruning —
 * `tb` is a pure function of `tok`, but no optimizer can know that —
 * so the scan listed and read all `buckets` directories. This rule
 * injects exactly that one fact, same design as
 * [[TagSupersetPruning]]: a Catalyst rule ANDing a derived partition
 * predicate into the filter and letting FileSourceStrategy turn it
 * into `PartitionFilters`, reusing the whole built-in parquet stack.
 *
 * Soundness: a TOP-LEVEL conjunct contributes when it PINS `tok` —
 * `tok = <lit>`, `tok IN (<lits>)`, or an OR whose EVERY disjunct
 * pins `tok` (possibly inside that disjunct's own conjunction, e.g.
 * `(tok = 'a' AND pos < 3) OR tok = 'b'`): any satisfying row
 * satisfies some disjunct, hence lands in that disjunct's buckets,
 * hence in the UNION the rule injects. An OR with any non-pinning
 * disjunct (`tok = 'a' OR pos = 3`) constrains nothing and the rule
 * bails. The injected `tb IN (<crc32 buckets>)` is implied by the
 * conjunct it derives from, so the rewrite can never change results —
 * only skip directories that cannot hold matches.
 * Unlike the store rule there is no staleness dimension: `buckets` is
 * the index's create-time identity (append/compact never change it),
 * so a prefix registration stays valid across appends.
 *
 * Idempotence: skips any filter already referencing `tb` — its own
 * output, and a user's explicit tb predicate (never second-guessed).
 */
object TermBucketPruning extends Rule[LogicalPlan] {

  /** index root (with trailing slash) -> bucket count. */
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Int]()

  /** Registration passes the raw index root (`/tmp/x/i`) while a
    * resolved relation's rootPaths are filesystem-qualified
    * (`file:/tmp/x/i/v0`) — the qualified form must still match (r15:
    * the unqualified compare silently never pruned in a session whose
    * reads qualify paths — a no-prune is invisible to correctness
    * gates, only to plans). BUT the scheme cannot simply be stripped
    * from both sides: `/data/idx` on the local FS and
    * `hdfs://nn/data/idx` are DIFFERENT indexes (different bucket
    * counts -> pruning with the wrong one silently drops rows). Rule:
    * a SCHEME-QUALIFIED registration matches only roots with the same
    * scheme; a scheme-less registration (the common local form)
    * matches on the path component alone. */
  private def norm(p: String): String = {
    val raw = new org.apache.hadoop.fs.Path(p).toUri.getPath
    if (raw.endsWith("/")) raw else raw + "/"
  }

  private def schemeOf(p: String): Option[String] =
    Option(new org.apache.hadoop.fs.Path(p).toUri.getScheme)

  /** Does relation root `r` live under registered root `reg`? */
  private def underRoot(r: String, reg: String): Boolean =
    norm(r).startsWith(norm(reg)) &&
      (schemeOf(reg).isEmpty || schemeOf(reg) == schemeOf(r))

  def register(indexRoot: String, buckets: Int): Unit = {
    require(buckets > 0, s"graft: buckets $buckets must be positive")
    registry.put(indexRoot, buckets); ()
  }

  private def bucketsFor(rel: HadoopFsRelation): Option[Int] = {
    val roots = rel.location.rootPaths.map(_.toString)
    if (roots.isEmpty) None
    else registry.asScala.collectFirst {
      case (root, b) if roots.forall(underRoot(_, root)) => b
    }
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** Term literals a top-level conjunct pins `tok` to, if it pins it. */
  private def termsOf(c: Expression): Option[Seq[String]] = c match {
    case EqualTo(a: AttributeReference, Literal(t, StringType))
        if a.name == "tok" && t != null => Some(Seq(t.toString))
    case EqualTo(Literal(t, StringType), a: AttributeReference)
        if a.name == "tok" && t != null => Some(Seq(t.toString))
    case In(a: AttributeReference, vs)
        if a.name == "tok" && vs.nonEmpty && vs.forall {
          case Literal(t, StringType) => t != null
          case _ => false
        } =>
      Some(vs.map { case Literal(t, StringType) => t.toString })
    // an OR pins tok iff EVERY disjunct pins it (each possibly via one
    // of its own conjuncts); the union of their terms is then implied
    case Or(l, r) =>
      for {
        a <- conjuncts(l).flatMap(termsOf).headOption
        b <- conjuncts(r).flatMap(termsOf).headOption
      } yield a ++ b
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, lr: LogicalRelation)
        if lr.relation.isInstanceOf[HadoopFsRelation]
          && !cond.references.exists(_.name == "tb") =>
      val rewritten = for {
        nBuckets <- bucketsFor(lr.relation.asInstanceOf[HadoopFsRelation])
        tb <- lr.output.find(a => a.name == "tb" && a.dataType == IntegerType)
        terms <- conjuncts(cond).flatMap(termsOf).headOption
      } yield {
        val tbs = terms
          .map(graft.operators.Search.termBucket(_, nBuckets)).distinct
        Filter(And(cond, In(tb, tbs.map(b => Literal(b)))), lr)
      }
      rewritten.getOrElse(f)
  }
}
