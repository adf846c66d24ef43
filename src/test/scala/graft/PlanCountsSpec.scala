package graft

import org.apache.spark.sql.functions._
import graft.tools.PlanCounts

/** The plan auditor's counting must be representation-stable: counts
  * come from the executed tree, so persisting a shared input frame (the
  * prefix-sum correctness pin does exactly this) cannot multiply them
  * the way a grep over the formatted string does. */
class PlanCountsSpec extends SparkSpec {

  test("tree counts don't multiply with references to a persisted frame; " +
    "the formatted-string count does (the r14 PlanAudit artifact)") {
    val base = spark.range(200).toDF("id").repartitionByRange(4, col("id"))
    val pinned = base.persist()
    try {
      val q = pinned.union(pinned).union(pinned).agg(sum("id").as("s"))
      q.collect() // finalize AQE
      val c = PlanCounts.of(q.queryExecution.executedPlan)
      // three references to the pin = three cache scans, each a LEAF;
      // the range exchange ran ONCE inside the cache build and must not
      // be counted per reference
      assert(c.cacheScans == 3, c)
      assert(c.exchanges <= 1, s"cache-build exchange leaked into the count: $c")
      // the formatted string reprints the cached build plan per
      // reference - the 30x artifact the tree walk exists to avoid
      val s = q.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val stringExchanges = "Exchange".r.findAllIn(s).size
      assert(stringExchanges >= 3,
        s"expected the string artifact (got $stringExchanges) - if explain " +
          "stopped reprinting cached plans, this guard can retire")
    } finally { pinned.unpersist(); () }
  }

  test("counts agree with the known shape of a broadcast-join query") {
    val dim = spark.range(10).toDF("k")
    val fact = spark.range(1000).toDF("id")
      .withColumn("k", col("id") % 10)
    val q = fact.join(broadcast(dim), "k").groupBy("k")
      .agg(count(lit(1)).as("n"))
    q.collect()
    val c = PlanCounts.of(q.queryExecution.executedPlan)
    assert(c.broadcastHash == 1, c)
    assert(c.cartesian == 0 && c.bnlj == 0, c)
    assert(c.partialAggs >= 1, c) // the groupBy combines map-side
    assert(c.codegenOps > 0, c)
  }
}
