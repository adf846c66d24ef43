package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.pipeline.{Fixtures, OrthologPipeline}

/** End-to-end wall-clock breakdown of the BENCHED flagship path
  * (BucketedPhases, exactly as SparkEntry.pipelineResult wires it):
  * state fixture reads, each bucketed phase write, and the final
  * strongPicks count. Distinguishes driver-side plan work + state
  * persistence from operator compute, so bench time is attributed
  * before optimizing the wrong layer. */
object FlagshipProbe {
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

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    for (iter <- 1 to 2) {
      println(s"--- iteration $iter")
      val total0 = System.nanoTime()
      val st = timed("fixtures.state")(Fixtures.state(spark, dir))
      val rel = timed("fixtures.relations")(Fixtures.relations(spark, dir))
      val runTs = java.sql.Timestamp.valueOf("2026-08-01 00:00:00")
      val base = java.nio.file.Files
        .createTempDirectory("graft_flagship_probe").toString
      val inner = OrthologPipeline.BucketedPhases(
        s"probe_fs_$iter", base, buckets = 16)
      val timedStore = new OrthologPipeline.PhaseStore {
        def apply(name: String, keys: Seq[String], df: DataFrame): DataFrame =
          timed(s"phase:$name")(inner(name, keys, df))
      }
      val res = timed("runSpecies(construct+phases)") {
        OrthologPipeline.runSpecies(rel, st, graft.model.Species.RAT, runTs,
          phases = timedStore)
      }
      timed("strongPicks count") {
        println(s"  picks=${res.strongPicks.groupBy("tier", "method").count().collect().length}")
      }
      println(f"TOTAL ${(System.nanoTime() - total0) / 1e9}%8.2f s")
    }
    spark.stop()
  }
}
