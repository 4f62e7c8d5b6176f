package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.functions.VecL2Expr
import graft.index.IvfIndex

/**
 * The `CREATE INDEX` planner integration (SURVEY §4.1 row 1 / build plan
 * M7): the reference's Postgres planner matches `ORDER BY embedding <-> q
 * LIMIT k` to the vchordrq opclass and plans an index scan (reference:
 * opclasses sql/install/vchord--1.1.1.sql:1138-1228, pushdown goldens
 * tests/vchordrq/pushdown_plan.slt). Here the same contract is a Catalyst
 * optimizer rule:
 *
 *     GlobalLimit k (Sort [vec_l2(vecCol, literal) ASC] (relation))
 *
 * over a Parquet relation registered in [[AnnCatalog]] becomes
 *
 *     GlobalLimit k (Sort [...] (Filter id IN (<ANN candidates>) relation))
 *
 * The index supplies candidate row ids (probe -> estimate -> rerank); the
 * IN filter pushes down to the Parquet scan, so the full-table sort
 * collapses to a k-row sort over fetched candidates. Like the reference's
 * index scan, results are the ANN answer — recall is governed by
 * `graft.ann.probes` / `graft.ann.refine` (session confs), and
 * `graft.ann.enable=false` is the `vchordrq.enable_scan` kill switch
 * (reference: src/index/gucs.rs:60).
 *
 * Rewrite fires only when the sort child is the bare relation (optionally
 * column-pruned) — any intervening Filter changes top-k semantics and
 * conservatively disables the rewrite (the reference handles that case
 * with prefilter machinery; here Catalyst keeps the exact plan).
 *
 * Enable per session:
 *   spark.experimental.extraOptimizations ++= Seq(AnnTopKRewrite(spark))
 * or globally with spark.sql.extensions=graft.plans.GraftSparkExtensions.
 */
object AnnCatalog {
  final case class Entry(indexDir: String, idCol: String, vecCol: String)

  private val entries = new java.util.concurrent.ConcurrentHashMap[String, Entry]()
  private val indexes = new java.util.concurrent.ConcurrentHashMap[String, IvfIndex]()

  private def norm(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  /** Register: reads of `tablePath` may be served by the index at `indexDir`. */
  def register(tablePath: String, indexDir: String, idCol: String, vecCol: String): Unit =
    entries.put(norm(tablePath), Entry(indexDir, idCol, vecCol))

  def unregister(tablePath: String): Unit = entries.remove(norm(tablePath))

  def lookup(rootPaths: Seq[String]): Option[Entry] =
    rootPaths.map(norm).flatMap(p => Option(entries.get(p))).headOption

  def index(spark: SparkSession, e: Entry): IvfIndex =
    indexes.computeIfAbsent(e.indexDir, d => IvfIndex.load(spark, d))
}

case class AnnTopKRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private def relationOf(plan: LogicalPlan): Option[LogicalRelation] = plan match {
    case r: LogicalRelation => Some(r)
    case Project(projList, r: LogicalRelation)
        if projList.forall(_.isInstanceOf[AttributeReference]) => Some(r)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.conf.get("graft.ann.enable", "true").toBoolean) return plan
    plan.transformDown {
      case gl @ GlobalLimit(IntegerLiteral(k),
          LocalLimit(_, sort @ Sort(
            Seq(SortOrder(VecL2Expr(attr: AttributeReference, Literal(qv: ArrayData, _)),
              Ascending, _, _)), true, child, _))) =>
        (for {
          rel <- relationOf(child)
          fsRel <- rel.relation match {
            case h: HadoopFsRelation => Some(h)
            case _ => None
          }
          entry <- AnnCatalog.lookup(fsRel.location.rootPaths.map(_.toString))
          if attr.name == entry.vecCol
          idAttr <- child.output.find(_.name == entry.idCol)
          // id literals must match the column's type (plan is already
          // analyzed — no implicit casts will be inserted)
          idLit <- idAttr.dataType match {
            case org.apache.spark.sql.types.LongType    => Some((id: Long) => Literal(id))
            case org.apache.spark.sql.types.IntegerType => Some((id: Long) => Literal(id.toInt))
            case _ => None
          }
          // the rule matches vec_l2 — only an l2-metric index may serve it
          if AnnCatalog.index(spark, entry).meta.cfg.metric == "l2"
        } yield {
          val probes = spark.conf.get("graft.ann.probes", "8").toInt
          val refine = spark.conf.get("graft.ann.refine", "8").toInt
          val idx = AnnCatalog.index(spark, entry)
          import spark.implicits._
          val ids = idx.search(qv.toFloatArray(), k, probes = probes, refine = refine)
            .select("id").as[Long].collect()
          if (ids.isEmpty) gl
          else {
            val filter = Filter(In(idAttr, ids.toSeq.map(idLit)), child)
            GlobalLimit(Literal(k), LocalLimit(Literal(k),
              Sort(sort.order, global = true, filter)))
          }
        }).getOrElse(gl)
    }
  }
}

/** `spark.sql.extensions` entry point. */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(session => AnnTopKRewrite(session))
}
