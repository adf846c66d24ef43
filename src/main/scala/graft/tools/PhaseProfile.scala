package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.pipeline.{Fixtures, OrthologPipeline}

/** Wall-clock profile of the BENCHED flagship path: the bucketed
  * phase-store run (OrthologPipeline.BucketedPhases), not the
  * localCheckpoint stand-in PipelineProfile times. Wraps the store so
  * every phase boundary reports its materialization time and the
  * number of files the bucketed write produced - the instrumentation
  * behind the round-16 phase-write optimization.
  */
object PhaseProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def fileCount(d: java.io.File): Int = {
      val kids = Option(d.listFiles()).getOrElse(Array.empty)
      kids.count(f => f.isFile && f.getName.startsWith("part-")) +
        kids.filter(_.isDirectory).map(fileCount).sum
    }

    // two iterations: first is JVM/codegen warmup, second steady-state
    for (iter <- 1 to 2) {
      println(s"--- iteration $iter")
      val base = java.nio.file.Files.createTempDirectory("graft_profile_state")
      val inner = OrthologPipeline.BucketedPhases(s"prof_$iter", base.toString,
        buckets = 16)
      val timing = new OrthologPipeline.PhaseStore {
        def apply(name: String, keys: Seq[String], df: DataFrame): DataFrame = {
          val t0 = System.nanoTime()
          val r = inner(name, keys, df)
          val dt = (System.nanoTime() - t0) / 1e9
          val nf = fileCount(new java.io.File(s"$base/$name"))
          println(f"phase $name%-14s ${dt}%7.2f s   $nf%4d files")
          r
        }
      }
      val st = Fixtures.state(spark, dir)
      val rel = Fixtures.relations(spark, dir)
      val runTs = java.sql.Timestamp.valueOf("2026-08-01 00:00:00")
      val t0 = System.nanoTime()
      val res = OrthologPipeline.runSpecies(rel, st, graft.model.Species.RAT,
        runTs, phases = timing)
      val tBuild = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      res.strongPicks
        .groupBy(org.apache.spark.sql.functions.col("tier"),
          org.apache.spark.sql.functions.col("method"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
      println(f"runSpecies build   ${tBuild}%7.2f s")
      println(f"picks count agg    ${(System.nanoTime() - t1) / 1e9}%7.2f s")
      graft.operators.ShardedPrefixSum.releaseAll()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
