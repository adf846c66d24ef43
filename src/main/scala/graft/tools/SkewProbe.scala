package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement harness behind the Skew.saltedJoin adoption decision
  * (PLANS.md "skew-join adoption"): plants a hot join key in the sf-dir
  * `documents` token stream (the Zipf-head shape every token-df join in
  * TextAnalysis/Dedup sees) and times the production join shape - token
  * frame joined to a NON-broadcastable per-term frame, feeding a
  * different-key aggregation - three ways:
  *
  *   plain      shuffled sort-merge join, AQE skew-join OFF
  *   aqe        the same plan with AQE skew-join ON (Bench/prod conf)
  *   salted     operators.Skew.saltedJoin (manual 16-way salt)
  *
  * Prints one line per variant: wall seconds + the max shuffle-read
  * bytes any single task of the TIMED run saw (from the final adaptive
  * plan's map statistics and AQE read specs - the per-task bound that
  * decides whether one straggler reducer serializes the stage at 1000
  * executors).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "runMain graft.tools.SkewProbe"
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // the local fixture cannot make one reducer's bytes cross AQE's
    // 256 MB default skew threshold, so the probe scales the THRESHOLD
    // to the data instead (the mechanism is identical; at 100 TB the
    // default threshold plays this role)
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100k")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "50k")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // token stream with a planted hot term dominating the stream: every
    // doc contributes its real tokens plus `hotCopies` rows of the hot
    // key - the Zipf-head shape ("the") a small fixture understates
    val hotCopies = 100
    // the md5 payload keeps hot-partition shuffle blocks incompressible:
    // AQE's skew detection reads partition BYTES, and 500k copies of a
    // constant key would lz4 down below any threshold (at 100 TB real
    // rows carry real payloads)
    val tokens = docs
      .select(col("doc_id"), explode(graft.llm.TextAnalysis
        .normalizedWords(col("text"))).as("term"))
      .union(docs.select(col("doc_id"),
        explode(array((1 to hotCopies).map(_ => lit("__hot__")): _*))
          .as("term")))
      .withColumn("payload",
        md5(concat(col("term"), col("doc_id").cast("string"),
          rand(1).cast("string"))))
      .persist()
    val nTok = tokens.count()
    // per-term df: vocab-sized, NOT broadcastable at corpus scale -
    // hint the planner away from broadcast so the probe measures the
    // shuffled-join regime the 100 TB path lives in.
    //
    // TWO dim variants, because they hit different AQE regimes:
    //  - dfreqCached: the persisted groupBy(term) output is already
    //    hash-partitioned on term, so the join adds NO exchange on that
    //    side - and OptimizeSkewedJoin only matches a join whose BOTH
    //    children are fresh Sort(ShuffleQueryStage). AQE cannot split
    //    the hot side here (no shuffle on the dim side to replicate).
    //  - dfreqDisk: the same frame round-tripped through parquet joins
    //    through its own fresh exchange - the regime AQE CAN optimize.
    val dfreqCached = tokens.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .hint("merge")
      .persist()
    dfreqCached.count()
    val dfreqPath = java.nio.file.Files
      .createTempDirectory("skewprobe_dfreq").toString
    dfreqCached.write.mode("overwrite").parquet(dfreqPath)
    val dfreqDisk = spark.read.parquet(dfreqPath).hint("merge")

    // Per-task shuffle-read bytes of the TIMED run, from the final
    // adaptive plan itself (mapStats + AQE read specs) - the old probe
    // measured a second `joined.rdd` execution whose adaptive plan
    // could differ from the timed one (the 500k aqe-ex anomaly in
    // PLANS.md). A skew-split PartialReducerPartitionSpec carries its
    // own dataSize, so the post-split per-task bound is exact.
    // per-task shuffle-read byte bound: shared helper (PlanMetrics)
    def maxShuffleTaskBytes(plan: org.apache.spark.sql.execution.SparkPlan): Long =
      PlanMetrics.maxShuffleTaskBytes(plan)

    def run(label: String, skewJoin: Boolean)(mk: => DataFrame): Unit = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewJoin)
      // isolate: AQE's coalesce stays on in both regimes (prod default)
      val joined = mk
      val t0 = System.nanoTime()
      val agg = joined.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n"), sum(col("df")).as("sum_df"))
      // drive agg's OWN QueryExecution (a write - and even Dataset.rdd -
      // wraps the plan in a new one), so the adaptive plan below is the
      // executed one
      agg.queryExecution.toRdd.foreach(_ => ())
      val sec = (System.nanoTime() - t0) / 1e9
      // after execution the adaptive plan is final: count skew-split
      // reader markers to prove whether OptimizeSkewedJoin fired, and
      // read the per-task byte bound from THIS plan's shuffle stats
      val physical = agg.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case other => other
      }
      val finalPlan = physical.toString
      val skewMarks = "skewed".r.findAllIn(finalPlan.toLowerCase).length
      val maxTask = maxShuffleTaskBytes(physical)
      println(f"SKEWPROBE $label%-7s sec=$sec%7.2f maxShuffleTaskBytes=$maxTask%d skewMarks=$skewMarks%d")
      if (sys.env.contains("SKEWPROBE_DEBUG"))
        println(finalPlan.take(1800))
    }

    println(s"SKEWPROBE tokens=$nTok (hot key ~${hotCopies.toLong * docs.count()} rows)")
    // regime 1: dim side co-partitioned (cached agg output) - AQE's
    // skew rule cannot match; salting is the only spread
    run("plain-co", skewJoin = false) { tokens.join(dfreqCached, Seq("term")) }
    run("aqe-co", skewJoin = true) { tokens.join(dfreqCached, Seq("term")) }
    run("salt-co", skewJoin = true) {
      graft.operators.Skew.saltedJoin(tokens, dfreqCached, Seq("term"), salts = 16)
    }
    // regime 2: dim side behind its own fresh exchange - AQE eligible
    run("plain-ex", skewJoin = false) { tokens.join(dfreqDisk, Seq("term")) }
    run("aqe-ex", skewJoin = true) { tokens.join(dfreqDisk, Seq("term")) }
    run("salt-ex", skewJoin = true) {
      graft.operators.Skew.saltedJoin(tokens, dfreqDisk, Seq("term"), salts = 16)
    }
    tokens.unpersist()
    dfreqCached.unpersist()
    spark.stop()
    // probe hygiene: the dim-side parquet round trip is scratch state
    scala.reflect.io.Path(dfreqPath).deleteRecursively()
  }
}
