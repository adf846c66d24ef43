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

    // every registered query must at least run on the smallest sf
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    var failed = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try fn(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        failed += 1
        println(s"QUERY_FAILED $name: ${e.getMessage}")
      }
    }
    println(s"QUERIES_OK=${graft.SparkEntry.queries.size - failed} FAILED=$failed")
    spark.stop()
  }
}
