package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the claim at StateStore.scala:9-21: a bucketed state table
  * makes the incoming<->state equi-join drop the state-side Exchange,
  * and at 10x-state scale that is the dominant shuffle of a run.
  *
  * Builds a synthetic ortholog-shaped state table (`--rows`, default
  * 5M) and an incoming batch at 1/10th of it, then runs the same
  * aggregate-over-equi-join three ways:
  *
  *   - `plain`: state as plain parquet (both sides shuffle);
  *   - `bucketed64` / `bucketed256`: state written via
  *     StateStore.writeBucketed at that bucket count (only the
  *     incoming side shuffles TO the bucket layout).
  *
  * Prints one line per variant: wall seconds (min of `--passes`, cold
  * file reads each pass) and the number of shuffle Exchanges in the
  * executed plan. Run on a quiet machine; output is recorded in
  * PLANS.md.
  *
  * Usage: runMain graft.tools.StateStoreBench [rows] [passes]
  */
object StateStoreBench {

  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 5000000L
    val passes = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // At cluster scale the incoming batch is GBs - never broadcastable.
    // Local fixtures ARE broadcastable, which would silently turn every
    // variant into a BroadcastHashJoin and hide the property under
    // measurement (the state-side Exchange), so pin the shuffle join.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import spark.implicits._

    val base = java.nio.file.Files
      .createTempDirectory("graft_ssbench").toString
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(base))
    }))

    // ortholog-shaped state: key + partner + a few payload columns
    def synth(n: Long, keyMod: Long): DataFrame =
      spark.range(n).select(
        (col("id") % keyMod).cast("int").as("srcRgdId"),
        (col("id") * 7 % keyMod).cast("int").as("destRgdId"),
        (col("id") % 19).cast("int").as("destSpeciesTypeKey"),
        concat(lit("src_"), col("id") % 11).as("dataSource"))

    val keyMod = rows / 4 // ~4 rows per key, like multi-partner orthologs
    println(s"state rows=$rows incoming=${rows / 10} keyMod=$keyMod")
    synth(rows, keyMod).write.mode("overwrite").parquet(s"$base/state_plain")
    graft.sources.StateStore.writeBucketed(
      synth(rows, keyMod), "ssbench_state_64", Seq("srcRgdId"),
      buckets = 64, path = Some(s"$base/state_b64"))
    graft.sources.StateStore.writeBucketed(
      synth(rows, keyMod), "ssbench_state_256", Seq("srcRgdId"),
      buckets = 256, path = Some(s"$base/state_b256"))
    synth(rows / 10, keyMod).write.mode("overwrite")
      .parquet(s"$base/incoming")

    def run(label: String, state: => DataFrame): Unit = {
      var best = Double.MaxValue
      var exchanges = -1L
      (1 to passes).foreach { _ =>
        spark.catalog.clearCache()
        val incoming = spark.read.parquet(s"$base/incoming")
          .select(col("srcRgdId"), col("destRgdId").as("inDestRgdId"))
        val joined = incoming.join(state, Seq("srcRgdId"))
          .groupBy(col("dataSource"))
          .agg(count(lit(1)).as("n"), countDistinct(col("destRgdId")).as("d"))
        val t0 = System.nanoTime()
        joined.collect(): Unit
        val sec = (System.nanoTime() - t0) / 1e9
        best = math.min(best, sec)
        exchanges = "Exchange [a-z]*partitioning".r
          .findAllIn(joined.queryExecution.executedPlan.toString).size.toLong
      }
      println(f"$label%-12s min_sec=$best%.2f exchanges=$exchanges")
    }

    run("plain", spark.read.parquet(s"$base/state_plain"))
    run("bucketed64", graft.sources.StateStore.read(spark, "ssbench_state_64"))
    run("bucketed256", graft.sources.StateStore.read(spark, "ssbench_state_256"))

    spark.sql("DROP TABLE IF EXISTS ssbench_state_64")
    spark.sql("DROP TABLE IF EXISTS ssbench_state_256")
    spark.stop()
  }
}
