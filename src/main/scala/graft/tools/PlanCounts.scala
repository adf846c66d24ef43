package graft.tools

import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.catalyst.expressions.aggregate.{Partial, PartialMerge}

/** Physical-operator counts taken from the executed plan TREE, not from
  * a grep over the formatted plan string.
  *
  * Why not the string: `explainString("formatted")` prints every cached
  * relation's CHILD plan in full at each reference, so persisting one
  * shared input frame can multiply a grep-based "Exchange" count by the
  * number of references (observed in round 14: q_m1_reconcile 65 ->
  * ~1800 after the prefix-sum pin landed) while the executed work is
  * unchanged. Counting nodes of the executed tree is representation-
  * stable: an [[InMemoryTableScanExec]] is a LEAF (its cache-build plan
  * runs once inside the cached RDD, not in this query), and a
  * [[ReusedExchangeExec]] is not descended (its child executed where it
  * was first planned), so each executed operator is counted exactly
  * once. AQE query stages are descended through `QueryStageExec.plan`.
  */
object PlanCounts {

  final case class Counts(broadcastHash: Int, sortMerge: Int,
                          shuffledHash: Int, exchanges: Int,
                          reusedExchanges: Int, codegenOps: Int,
                          partialAggs: Int, cartesian: Int, bnlj: Int,
                          adaptiveRoots: Int, cacheScans: Int,
                          pushedFilters: Seq[String],
                          readSchemas: Seq[String])

  /** All executed nodes, each once: descend AQE stages, stop at reused
    * exchanges and cache scans. */
  def nodes(plan: SparkPlan): Seq[SparkPlan] = {
    def walk(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case _: ReusedExchangeExec => Nil // child counted at first plan site
      case _: InMemoryTableScanExec => Nil // cache-build plan is not this query
      case other => other.children.flatMap(walk)
    })
    walk(plan)
  }

  /** Operators fused into whole-stage-codegen regions (the tree
    * equivalent of counting "[codegen id : n]" annotations): nodes
    * under a [[WholeStageCodegenExec]] up to, and not across, the
    * [[InputAdapter]] boundaries that end a region. */
  private def fusedOps(plan: SparkPlan): Int = {
    def inRegion(p: SparkPlan): Int = p match {
      case _: InputAdapter => 0
      case other => 1 + other.children.map(inRegion).sum
    }
    nodes(plan).collect { case w: WholeStageCodegenExec => inRegion(w.child) }.sum
  }

  def of(plan: SparkPlan): Counts = {
    val ns = nodes(plan)
    def n(pf: PartialFunction[SparkPlan, Unit]): Int = ns.count(pf.isDefinedAt)
    val partialAggs = ns.count {
      case h: HashAggregateExec =>
        h.aggregateExpressions.exists(a =>
          a.mode == Partial || a.mode == PartialMerge)
      case o: ObjectHashAggregateExec =>
        o.aggregateExpressions.exists(a =>
          a.mode == Partial || a.mode == PartialMerge)
      case s: SortAggregateExec =>
        s.aggregateExpressions.exists(a =>
          a.mode == Partial || a.mode == PartialMerge)
      case _ => false
    }
    val scans = ns.collect { case f: FileSourceScanExec => f }
    Counts(
      broadcastHash = n { case _: BroadcastHashJoinExec => () },
      sortMerge = n { case _: SortMergeJoinExec => () },
      shuffledHash = n { case _: ShuffledHashJoinExec => () },
      exchanges = n {
        case _: ShuffleExchangeExec => ()
        case _: BroadcastExchangeExec => ()
      },
      reusedExchanges = n { case _: ReusedExchangeExec => () },
      codegenOps = fusedOps(plan),
      partialAggs = partialAggs,
      cartesian = n { case _: CartesianProductExec => () },
      bnlj = n { case _: BroadcastNestedLoopJoinExec => () },
      adaptiveRoots = n { case _: AdaptiveSparkPlanExec => () },
      cacheScans = n { case _: InMemoryTableScanExec => () },
      pushedFilters = scans.flatMap(_.metadata.get("PushedFilters"))
        .filter(v => v.exists(_.isLetter)),
      readSchemas = scans.flatMap(_.metadata.get("ReadSchema")))
  }
}
