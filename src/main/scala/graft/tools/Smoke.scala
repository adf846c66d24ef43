package graft.tools

import org.apache.spark.sql.SparkSession

/** Driver-shaped smoke check: runs SparkEntry.entry the way the harness
  * does (t1), prints row count + a sample, and cross-checks the
  * queries/oracleSql registries for orphans. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val df = graft.SparkEntry.entry(spark)
    println("ENTRY_ROWS=" + df.count())
    df.show(5, truncate = false)

    val orphans = graft.SparkEntry.oracleSql.keySet -- graft.SparkEntry.queries.keySet
    println("ORPHAN_ORACLES=" + orphans)

    // every registered query must at least run on the smallest sf -
    // AND its physical plan must be free of data-sized nested-loop /
    // cartesian joins (the registry-wide sweep for the constant-fold
    // BNLJ class the round-9 10x gate caught in the AGR upsert)
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"

    // The byte-BPE train/encode DuckDB oracles remap only the space
    // byte (space -> chr(288)); that shortcut is valid iff the
    // documents corpus contains printable ASCII + space ONLY. Enforce
    // the assumption instead of assuming it: any tab / newline /
    // non-ASCII character in any fixture document fails the smoke run.
    val nonPrintable = spark.read.parquet(s"$dir/documents.parquet")
      .where(org.apache.spark.sql.functions.col("text").isNotNull &&
        org.apache.spark.sql.functions.col("text").rlike("[^ -~]"))
      .count()
    println(s"NON_PRINTABLE_ASCII_DOCS=$nonPrintable")

    // q_stream_ann / q_stream_ann_mb share the batch knnJoin oracle
    // VERBATIM, which is sound only while their query frame
    // (vec_id < 5) has no null embeddings: the streaming side DROPS
    // nulls where knnJoin pads null-cosine rank-last rows
    // (StreamingAnn.candidates scaladoc). Enforce the fixture property
    // here so a fixture change fails the smoke run with a named cause,
    // not a confusing downstream hash mismatch.
    val nullAnnQueries = spark.read.parquet(s"$dir/embeddings.parquet")
      .where(org.apache.spark.sql.functions.col("vec_id") < 5 &&
        org.apache.spark.sql.functions.col("embedding").isNull)
      .count()
    println(s"NULL_EMBEDDING_ANN_QUERIES=$nullAnnQueries")

    var failed = 0
    var planBad = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        badJoins(df.queryExecution.sparkPlan, name).foreach { msg =>
          planBad += 1
          println(s"PLAN_VIOLATION $msg")
        }
        df.write.format("noop").mode("overwrite").save()
      } catch { case e: Throwable =>
        failed += 1
        println(s"QUERY_FAILED $name: ${e.getMessage}")
      }
    }
    println(s"QUERIES_OK=${graft.SparkEntry.queries.size - failed} FAILED=$failed")
    println(s"PLAN_VIOLATIONS=$planBad")
    spark.stop()
    if (failed > 0 || planBad > 0 || nonPrintable > 0 ||
      nullAnnQueries > 0) sys.exit(1)
  }

  /** Non-scalar BroadcastNestedLoopJoin / CartesianProduct findings in
    * a physical plan. A BNLJ is acceptable ONLY when its build side
    * unwraps to a global (no-grouping) aggregate or a <=1-row local
    * relation (the scalar-attach convention) - with one whitelisted
    * two whitelisted exceptions: q_ann_recall's broadcast probe set
    * (documented driver-bounded query frame) and q_t_source_kl's
    * |strata|-row per-source totals (the dense vocab x sources support
    * build - bounded by the stratum count, documented in LmScore). */
  private val bnljWhitelist = Set("q_ann_recall", "q_t_source_kl")

  private def badJoins(plan: org.apache.spark.sql.execution.SparkPlan,
                       name: String): Seq[String] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec}
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
    import org.apache.spark.sql.execution.{InputAdapter, LocalTableScanExec, ProjectExec, WholeStageCodegenExec}
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val next = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        case _ => p.children
      }
      p +: next.flatMap(flatten)
    }
    @annotation.tailrec
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case q: QueryStageExec => unwrap(q.plan)
      case e: BroadcastExchangeExec => unwrap(e.child)
      case r: ReusedExchangeExec => unwrap(r.child)
      case w: WholeStageCodegenExec => unwrap(w.child)
      case i: InputAdapter => unwrap(i.child)
      case pr: ProjectExec => unwrap(pr.child)
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case _ => p
    }
    def isScalar(p: SparkPlan): Boolean = unwrap(p) match {
      case h: HashAggregateExec => h.groupingExpressions.isEmpty
      case o: ObjectHashAggregateExec => o.groupingExpressions.isEmpty
      case s: SortAggregateExec => s.groupingExpressions.isEmpty
      case l: LocalTableScanExec => l.rows.lengthCompare(1) <= 0
      case _ => false
    }
    if (bnljWhitelist(name)) Nil
    else flatten(plan).flatMap {
      case c: CartesianProductExec =>
        Seq(s"$name: CartesianProduct in plan")
      case b: BroadcastNestedLoopJoinExec =>
        val build = b.buildSide match {
          case BuildLeft => b.left
          case BuildRight => b.right
        }
        if (isScalar(build)) Nil
        else Seq(s"$name: non-scalar BNLJ build side " +
          s"(${b.joinType}, cond=${b.condition})")
      case _ => Nil
    }
  }
}
