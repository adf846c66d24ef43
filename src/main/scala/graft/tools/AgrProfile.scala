package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Agr
import graft.pipeline.{Fixtures, OrthologPipeline}

/** Stage-level wall-clock profile of the --agrOrthologs chain behind
  * q_agr_counts / q_agr_e2e (PLANS.md "q_agr_counts trend"): times each
  * phase of AgrPipeline.run separately so a drifting total can be
  * attributed to a NAMED stage instead of re-measured as one number.
  * Two iterations; the first carries JVM/codegen warmup.
  *
  * The stage bodies MIRROR AgrPipeline.run (the curies union, maxRgd
  * scalar, r1/r2 bind, incoming mapping) - run() cannot expose
  * per-stage hooks without giving up its single-plan shape. Drift is
  * GUARDED, not just warned about: [[stagedFinalState]] is the single
  * staged chain both the profiler and AgrProfileSpec use, and the spec
  * asserts its final state equals AgrPipeline.run's output row for row,
  * so a semantic change to run() that is not mirrored here fails the
  * suite instead of silently mis-attributing. */
object AgrProfile {

  /** Per-stage timing hook: the profiler prints wall clock, the drift
    * spec passes a pass-through. */
  type Timer = String => (=> DataFrame) => DataFrame

  /** The staged replica of AgrPipeline.run's chain through the A8
    * guard, with a timer around each phase boundary. Returns the final
    * AGR ortholog state (the frame run() ships as Result.agrOrthologs). */
  def stagedFinalState(lines0: DataFrame, st: OrthologPipeline.State,
                       runTs: java.sql.Timestamp,
                       cutoff: java.sql.Timestamp,
                       timed: Timer): DataFrame = {
    val lines = timed("fixtures ckpt") {
      val l = lines0.localCheckpoint(); l.count(); l
    }
    // run() pays this scalar up front, so time it as its own stage
    // rather than folding it into the guard
    var initialCount = 0L
    timed("initial state count") {
      initialCount = st.agrOrthologs.count(); st.agrOrthologs
    }
    val curies = timed("curies distinct") {
      val c = lines.select(col("curie1").as("curie"),
          col("geneSymbol1").as("geneSymbol"),
          col("speciesTypeKey1").as("speciesTypeKey"))
        .unionByName(lines.select(col("curie2").as("curie"),
          col("geneSymbol2").as("geneSymbol"),
          col("speciesTypeKey2").as("speciesTypeKey")))
        .distinct().localCheckpoint()
      c.count(); c
    }
    var maxRgd = 0
    timed("max rgdId scalar") {
      maxRgd = st.genes.agg(coalesce(max(col("rgdId")), lit(0))).first().getInt(0)
      st.genes
    }
    val resolved = timed("resolve+assign ckpt") {
      val r = Agr.assignNewGenes(
        Agr.resolveCuries(curies, st.xrefs, st.genes, st.rgdIds), maxRgd)
        .localCheckpoint()
      r.count(); r
    }
    val upserted = timed("bind+upsert ckpt") {
      val r1 = resolved.select(col("curie").as("curie1"), col("rgdId").as("rgdId1"))
      val r2 = resolved.select(col("curie").as("curie2"), col("rgdId").as("rgdId2"))
      val bound = lines.join(r1, Seq("curie1")).join(r2, Seq("curie2"))
        .filter(col("rgdId1").isNotNull && col("rgdId2").isNotNull)
      val incoming = bound.select(
        col("rgdId1").as("geneRgdId1"),
        col("rgdId2").as("geneRgdId2"),
        lit("stringent").as("confidence"),
        when(col("isBestScore"), "Y").otherwise("N").as("isBestScore"),
        when(col("isBestRevScore"), "Y").otherwise("N").as("isBestRevScore"),
        col("algorithms").as("methodsMatched"))
      val u = Agr.upsertAgrOrthologs(incoming, st.agrOrthologs, runTs)
        .localCheckpoint()
      u.count(); u
    }
    timed("guard+stale delete") {
      Agr.deleteStaleWithGuard(upserted, cutoff, initialCount, "10%")._1
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val printTimer: Timer = name => f => {
      val t0 = System.nanoTime()
      val r = f
      println(f"AGRPROFILE $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val runTs = java.sql.Timestamp.valueOf("2026-08-01 12:00:00")
    val cutoff = java.sql.Timestamp.valueOf("2026-08-01 11:00:00")

    for (iter <- 1 to 2) {
      println(s"--- iteration $iter")
      val finalState = stagedFinalState(
        Fixtures.allianceLines(spark, dir), Fixtures.state(spark, dir),
        runTs, cutoff, printTimer)
      printTimer("final groupBy") {
        val d = finalState
          .groupBy(col("isBestScore"), col("isBestRevScore"), col("methodsMatched"))
          .agg(count(lit(1)).as("n"))
        d.write.format("noop").mode("overwrite").save()
        d
      }
      // the REAL entry point, unstaged - what q_agr_counts times; a gap
      // between this and the staged total above is a run()-shape issue,
      // not an operator issue
      printTimer("AgrPipeline.run e2e") {
        val st = Fixtures.state(spark, dir)
        val r = graft.pipeline.AgrPipeline.run(
          Fixtures.allianceLines(spark, dir), st.agrOrthologs, st.xrefs,
          st.genes, st.rgdIds, runTs, cutoff)
        val d = r.agrOrthologs
          .groupBy(col("isBestScore"), col("isBestRevScore"), col("methodsMatched"))
          .agg(count(lit(1)).as("n"))
        d.write.format("noop").mode("overwrite").save()
        d
      }
    }
    spark.stop()
  }
}
