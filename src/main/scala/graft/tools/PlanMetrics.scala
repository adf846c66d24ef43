package graft.tools

import org.apache.spark.sql.execution.SparkPlan

/** Post-execution adaptive-plan metrics shared by the skew probes
  * ([[SkewProbe]], [[AgrHotSymbolProbe]]): the per-task shuffle-read
  * byte bound of an EXECUTED plan - the number that decides whether one
  * straggler reducer serializes a stage at 1000 executors. */
object PlanMetrics {

  /** Unwrap the final physical tree of an executed query. */
  def finalPlan(qe: org.apache.spark.sql.execution.QueryExecution): SparkPlan =
    qe.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }

  /** Max shuffle-read bytes any single task of the executed plan saw,
    * from the adaptive plan's map statistics and AQE read specs. A
    * skew-split PartialReducerPartitionSpec carries its own dataSize,
    * so the post-split per-task bound is exact. Query stages are leaf
    * nodes for `collect`, so the walk descends into QueryStageExec.plan
    * explicitly. */
  def maxShuffleTaskBytes(plan: SparkPlan): Long = {
    import org.apache.spark.sql.execution.adaptive._
    import org.apache.spark.sql.execution.{CoalescedPartitionSpec,
      PartialReducerPartitionSpec}
    def allNodes(p: SparkPlan): Seq[SparkPlan] =
      p +: (p.children.flatMap(allNodes) ++ (p match {
        case q: QueryStageExec => allNodes(q.plan)
        case _ => Nil
      }))
    def stageBytes(st: ShuffleQueryStageExec): Seq[Long] =
      st.mapStats.map(_.bytesByPartitionId.toSeq).getOrElse(Nil)
    val perTask = allNodes(plan).flatMap {
      case r: AQEShuffleReadExec =>
        val perPart = r.child match {
          case st: ShuffleQueryStageExec => stageBytes(st)
          case _ => Nil
        }
        r.partitionSpecs.map {
          case PartialReducerPartitionSpec(_, _, _, dataSize) => dataSize
          case CoalescedPartitionSpec(s0, s1, dataSize) =>
            dataSize.getOrElse(
              if (perPart.isEmpty) 0L else (s0 until s1).map(perPart).sum)
          case _ => 0L
        }
      case st: ShuffleQueryStageExec => stageBytes(st)
      case _ => Nil
    }
    perTask.foldLeft(0L)(math.max)
  }
}
