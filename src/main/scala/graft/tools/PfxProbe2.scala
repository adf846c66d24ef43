package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Repeated-execution probe for the ShardedPrefixSum consumers: runs a
  * registry query N times in one session (Verify-shaped: SPARK_GRAFT_CPUS
  * cores and shuffle partitions, default 4 - the sparse-boundary-sample
  * regime - and a coalesce(1) full-column write) and prints each run's
  * row count AND full-content hash. Any drift means the two
  * materializations of the range exchange sampled different boundaries
  * (the bug the persist/InMemoryRelation pin in cumBefore rules out).
  * Usage: runMain graft.tools.PfxProbe2 /root/testdata/sf0.1 15 q_pack_export */
object PfxProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(20)
    val qname = args.lift(2).getOrElse("q_sample_budget_stratum")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sigs = (1 to n).map { i =>
      val df = graft.SparkEntry.queries(qname)(spark, dir)
      // the Verify-shaped path: a full-column parquet write (column
      // pruning OFF), then read back - count() alone planned
      // differently and masked the original failure
      val out = s"/tmp/pfxprobe2_run$i"
      org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(out), true)
      df.coalesce(1).write.mode("overwrite").parquet(out)
      val back = spark.read.parquet(out)
      val c = back.count()
      // order-insensitive full-content signature (decimal sum of row
      // hashes - a plain long sum overflows under ANSI)
      val h = back.select(
          sum(xxhash64(back.columns.map(col): _*).cast("decimal(38,0)")))
        .first().getDecimal(0)
      println(s"RUN $i COUNT=$c HASH=$h")
      (c, h)
    }
    println(s"DISTINCT_SIGS=${sigs.distinct.size} (${sigs.distinct.take(5).mkString(";")})")
    spark.stop()
  }
}
