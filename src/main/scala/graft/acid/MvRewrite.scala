package graft.acid

import java.util.concurrent.ConcurrentHashMap

import scala.util.control.{ControlThrowable, NonFatal}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types._

/** Session extension that installs [[MvRewriteRule]] — transparent
  * materialized-view query acceleration.
  *
  * Registered by `Engine.session` (and usable standalone via
  * `spark.sql.extensions=graft.acid.GraftExtensions`). The rule is a
  * no-op until `spark.graft.mv.rewrite` is set to `true`, so plans are
  * byte-identical with the flag off. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(s => MvRewriteRule(s))
}

/** Rewrites an aggregate over a graft table to scan a REGISTERED,
  * EXACTLY-FRESH materialized view instead — the optimizer-side payoff
  * of the dependent-view registry: users keep writing
  * `SELECT g, sum(v) FROM fact GROUP BY g` and the plan silently reads
  * the (tiny) view when one answers the query.
  *
  * A rewrite fires only when ALL of the following hold — every guard
  * fails toward "no rewrite", never toward a wrong answer:
  *
  *  - the aggregate's input is a graft DSv2 relation (optionally under
  *    attribute-only Projects and Filters), pinned at version V;
  *  - a view registered on that table has its refresh watermark at
  *    EXACTLY V (the view then reflects precisely the snapshot the
  *    relation would scan — fresher or staler both disqualify) and no
  *    dimension joins;
  *  - the recorded group/sum/min/max columns still carry their
  *    definition-time logical names at V (physical-identity guard: a
  *    rename + re-add of a column name must not silently bind the view
  *    to the wrong data);
  *  - the query groups by a SUBSET of the view's group columns (plain
  *    column references; rollup compensation re-aggregates), and every
  *    aggregate translates: `count(*)` → `sum(cnt)`, `count(c)` →
  *    `sum(nn_c)`, `sum(c)` → `sum(sum_c)`, `avg(c)` →
  *    `sum(sum_c)/sum(nn_c)`, `min/max(c)` → `min/max(min_c/max_c)`,
  *    min/max/count over group columns directly — no DISTINCT, no
  *    FILTER clauses;
  *  - the query's WHERE conjuncts partition into (a) conjuncts
  *    semantically equal to the view's own WHERE conjuncts (all of
  *    which must be covered) and (b) residual conjuncts over group
  *    columns only, which are kept over the view scan.
  *
  * The rewritten child pins the view at ITS head version (a snapshot is
  * immutable), so a concurrent refresh between optimization and
  * execution cannot skew results. Global aggregates coalesce counts to
  * 0 so an empty table still answers `count(*) = 0`.
  *
  * Scale design: the driver-side candidate lookup is a few metadata
  * reads memoized per (table, version) for [[MvRewriteRule.TtlNanos]] —
  * at 100 TB the rewrite turns a full fact scan into a view scan, and
  * the lookup cost is the same handful of object-store RPCs the catalog
  * already pays to resolve the table. Correctness never depends on the
  * cache: entries are keyed by the PINNED source version, and a view
  * matching that version keeps matching it forever.
  *
  * Reference analog: db-core answers summary probes from its derived
  * per-object summaries rather than the heap (free_info.rs:34-88); here
  * the summary is the view table and the probe is any matching
  * aggregate. */
case class MvRewriteRule(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  import MvRewriteRule._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "false").toBoolean) return plan
    plan.transformUp {
      case agg: Aggregate =>
        try rewrite(agg).getOrElse(agg)
        catch {
          case Bail => agg
          case NonFatal(e) =>
            logWarning(s"mv rewrite skipped (${e.getClass.getSimpleName}: " +
              s"${e.getMessage})")
            agg
        }
    }
  }

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    // peel attribute-only Projects and collect Filter conjuncts down to
    // a graft relation; anything else disqualifies
    @annotation.tailrec
    def peel(p: LogicalPlan, conds: Seq[Expression])
        : Option[(DataSourceV2Relation, GraftTable, Seq[Expression])] =
      p match {
        case f: Filter =>
          peel(f.child, conds ++ splitConjunctivePredicates(f.condition))
        case pr: org.apache.spark.sql.catalyst.plans.logical.Project
            if pr.projectList.forall(_.isInstanceOf[AttributeReference]) =>
          peel(pr.child, conds)
        case r: DataSourceV2Relation => r.table match {
          case t: GraftTable => Some((r, t, conds))
          case _ => None
        }
        case _ => None
      }
    peel(agg.child, Nil).flatMap { case (rel, table, conds) =>
      val cands = candidates(table.tableRoot, table.tableVersion)
      // smallest view first: fewer group columns = coarser = cheaper
      cands.sortBy(_.d.groupCols.size).iterator
        .map(c => try Some(tryMatch(agg, rel, conds, c))
          catch { case Bail => None })
        .collectFirst { case Some(p) => p }
    }
  }

  /** Attempt the rewrite against one candidate; throws [[Bail]] on any
    * disqualifier. */
  private def tryMatch(agg: Aggregate, rel: DataSourceV2Relation,
      conds: Seq[Expression], cand: Candidate): LogicalPlan = {
    def fail(): Nothing = throw Bail
    val resolver = conf.resolver
    val d = cand.d

    val vTable = new GraftTable(cand.root, cand.version, cand.schema,
      timeTraveled = true)
    val vRel = DataSourceV2Relation.create(vTable, None, None)
    def viewAttr(name: String): AttributeReference =
      vRel.output.collectFirst {
        case a: AttributeReference if resolver(a.name, name) => a
      }.getOrElse(fail())

    def defName(cols: Seq[String], n: String): String =
      cols.find(resolver(_, n)).getOrElse(fail())
    def isGroup(n: String) = d.groupCols.exists(resolver(_, n))
    def isSum(n: String) = d.sumCols.exists(resolver(_, n))
    def isMin(n: String) = d.minCols.exists(resolver(_, n))
    def isMax(n: String) = d.maxCols.exists(resolver(_, n))

    // ---- WHERE compatibility ------------------------------------------
    val whereConjs: Seq[Expression] = d.where match {
      case None => Nil
      case Some(sql) =>
        val parsed = spark.sessionState.sqlParser.parseExpression(sql)
        val analyzed =
          try spark.sessionState.analyzer.execute(Filter(parsed, rel))
          catch { case NonFatal(_) => fail() }
        org.apache.spark.sql.catalyst.optimizer.ConstantFolding(analyzed) match {
          case Filter(c, _) => splitConjunctivePredicates(c)
          case _ => fail()
        }
    }
    // every view-WHERE conjunct must appear in the query's conjuncts
    // (else the view is missing rows the query wants)
    if (!whereConjs.forall(wc => conds.exists(_.semanticEquals(wc)))) fail()
    // residual conjuncts must be deterministic and over group columns
    val residual = conds.filterNot(c => whereConjs.exists(_.semanticEquals(c)))
    def remapGroupOnly(e: Expression): Expression = e.transformUp {
      case a: AttributeReference =>
        if (isGroup(a.name)) viewAttr(defName(d.groupCols, a.name)) else fail()
    }
    if (!residual.forall(_.deterministic)) fail()
    val remappedResidual = residual.map(remapGroupOnly)

    // ---- grouping -----------------------------------------------------
    val groupMap: Map[ExprId, AttributeReference] =
      agg.groupingExpressions.map {
        case a: AttributeReference if isGroup(a.name) =>
          a.exprId -> viewAttr(defName(d.groupCols, a.name))
        case _ => fail()
      }.toMap

    // ---- aggregate translation ----------------------------------------
    def aggE(f: AggregateFunction): AggregateExpression =
      AggregateExpression(f, Complete, isDistinct = false)
    def cntShape(e: Expression): Expression =
      // grouped: a view group always has >= 1 row, so the sum is never
      // null at runtime; Coalesce restores the static non-nullable type
      // AND fixes the empty-table global count (sum over 0 rows = null,
      // count(*) = 0)
      Coalesce(Seq(e, Literal(0L)))
    def integral(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    def translate(ae: AggregateExpression): Expression = {
      if (ae.isDistinct || ae.filter.isDefined) fail()
      ae.aggregateFunction match {
        case c: Count
            if c.children.forall(ch => ch.foldable && ch.eval(null) != null) =>
          cntShape(aggE(new Sum(viewAttr("cnt"))))
        case c: Count => c.children match {
          case Seq(a: AttributeReference) if isSum(a.name) =>
            cntShape(aggE(new Sum(
              viewAttr("nn_" + defName(d.sumCols, a.name)))))
          case Seq(a: AttributeReference) if isGroup(a.name) =>
            val g = viewAttr(defName(d.groupCols, a.name))
            cntShape(aggE(new Sum(
              If(IsNull(g), Literal(0L), viewAttr("cnt")))))
          case _ => fail()
        }
        case s: Sum => s.child match {
          // the view stores sum_<c> as the exact long sum; only integral
          // sources produce LongType sums, which is exactly when the
          // stored partial is lossless
          case a: AttributeReference if isSum(a.name) &&
              s.dataType == LongType =>
            aggE(new Sum(viewAttr("sum_" + defName(d.sumCols, a.name))))
          case _ => fail()
        }
        case av: Average => av.child match {
          case a: AttributeReference if isSum(a.name) &&
              av.dataType == DoubleType && integral(a.dataType) =>
            val n = defName(d.sumCols, a.name)
            // avg(c) = sum(c) / count(NON-NULL c); null-safe division:
            // an all-null group sums to null -> null, never /0
            new Divide(
              Cast(aggE(new Sum(viewAttr("sum_" + n))), DoubleType),
              Cast(aggE(new Sum(viewAttr("nn_" + n))), DoubleType))
          case _ => fail()
        }
        case m: Min => m.child match {
          case a: AttributeReference if isMin(a.name) =>
            aggE(Min(viewAttr("min_" + defName(d.minCols, a.name))))
          case a: AttributeReference if isGroup(a.name) =>
            aggE(Min(viewAttr(defName(d.groupCols, a.name))))
          case _ => fail()
        }
        case m: Max => m.child match {
          case a: AttributeReference if isMax(a.name) =>
            aggE(Max(viewAttr("max_" + defName(d.maxCols, a.name))))
          case a: AttributeReference if isGroup(a.name) =>
            aggE(Max(viewAttr(defName(d.groupCols, a.name))))
          case _ => fail()
        }
        case _ => fail()
      }
    }
    // manual recursion: translate() consumes the ORIGINAL agg children,
    // so a transform must not rewrite attributes underneath an
    // AggregateExpression before the aggregate itself is seen
    def tx(e: Expression): Expression = e match {
      case ae: AggregateExpression => translate(ae)
      case a: AttributeReference => groupMap.getOrElse(a.exprId, fail())
      case other => other.mapChildren(tx)
    }
    val newAes: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case al: Alias =>
        Alias(tx(al.child), al.name)(exprId = al.exprId,
          qualifier = al.qualifier, explicitMetadata = al.explicitMetadata)
      case a: AttributeReference =>
        Alias(tx(a), a.name)(exprId = a.exprId, qualifier = a.qualifier)
      case _ => fail()
    }
    // output contract: same names and types, nullability may not narrow
    agg.aggregateExpressions.zip(newAes).foreach { case (o, n) =>
      if (o.name != n.name || o.dataType != n.dataType ||
          (!o.nullable && n.nullable)) fail()
    }
    val child: LogicalPlan =
      if (remappedResidual.isEmpty) vRel
      else Filter(remappedResidual.reduce(And), vRel)
    val newGes = agg.groupingExpressions.map {
      case a: AttributeReference => groupMap(a.exprId)
      case _ => fail()
    }
    logInfo(s"mv rewrite: aggregate over ${cand.srcRoot}@v" +
      s"${cand.srcVersion} now reads view ${cand.root}@v${cand.version}")
    Aggregate(newGes, newAes, child)
  }

  /** Views of (root, pinned version) that are exactly fresh, dim-free,
    * and rename-stable — memoized for [[TtlNanos]]. */
  private def candidates(root: String, version: Long): Seq[Candidate] = {
    val canon = new Path(root).toString
    val key = (canon, version)
    val now = System.nanoTime()
    val hit = cache.get(key)
    if (hit != null && now - hit.at < TtlNanos) return hit.cands
    val cands = try computeCandidates(canon, version)
      catch { case NonFatal(_) => Nil }
    if (cache.size > MaxCacheEntries) cache.clear()
    cache.put(key, Entry(now, cands))
    cands
  }

  private def computeCandidates(root: String, version: Long)
      : Seq[Candidate] = {
    val inst = VersionedTable.open(spark, root)
    val viewRoots = MaterializedAggView.registeredViews(inst)
    if (viewRoots.isEmpty) return Nil
    // logical -> physical mapping at the PINNED version, for the
    // rename-stability guard
    val renames = inst.tableStateAt(version).renames
    viewRoots.flatMap { vr =>
      try {
        val vInst = VersionedTable.open(spark, vr)
        val d = MaterializedAggView.readDef(vInst)
        val dims = d.dimSources.getOrElse(d.dimSource.toSeq)
        if (dims.nonEmpty) None
        else {
          val vv = vInst.latestVersion
          val wm = vInst.appTxnsAt(vv)
            .getOrElse("mv:" + new Path(vr).toString, -1L)
          if (wm != version) None
          else {
            def stable(cols: Seq[String], phys: Option[Seq[String]]) =
              phys.forall(_.zip(cols).forall { case (p, c) =>
                renames.getOrElse(c, c) == p })
            if (!stable(d.groupCols, d.groupPhys) ||
                !stable(d.sumCols, d.sumPhys) ||
                !stable(d.minCols, d.minPhys) ||
                !stable(d.maxCols, d.maxPhys)) None
            else {
              val schema = StructType.fromDDL(vInst.stateAt(vv)._2)
              Some(Candidate(new Path(vr).toString, vv, schema, d,
                root, version))
            }
          }
        }
      } catch { case NonFatal(_) => None }
    }
  }
}

object MvRewriteRule {
  /** Session conf flag; default off — plans are untouched unless the
    * user opts in. */
  val EnabledKey = "spark.graft.mv.rewrite"

  private case object Bail extends ControlThrowable

  private[acid] final case class Candidate(root: String, version: Long,
      schema: StructType, d: MaterializedAggView.MvDef,
      srcRoot: String, srcVersion: Long)

  private final case class Entry(at: Long, cands: Seq[Candidate])

  // keyed by (canonical source root, PINNED source version): immutable
  // once computed except for views refreshing TO that version, which
  // the TTL picks up
  private val cache = new ConcurrentHashMap[(String, Long), Entry]
  private val TtlNanos = 10L * 1000 * 1000 * 1000
  private val MaxCacheEntries = 256

  /** Test/ops hook: drop memoized candidates (e.g. right after a
    * refresh, to observe the rewrite without waiting out the TTL). */
  def invalidateCache(): Unit = cache.clear()
}
