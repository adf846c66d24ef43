package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level wall-clock breakdown of q_d_containment (bottom-k
  * containment pairs): sketch build vs blocking window vs candidate
  * join vs sketch-attach - the r16 instrumentation for deciding which
  * stage is worth restructuring. */
object ContainProbe {
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

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    for (iter <- 1 to 2) {
      println(s"--- iteration $iter")
      val full = timed("full query compose") {
        graft.llm.Dedup.bottomKContainmentPairs(docs,
          k = 12, shingleN = 3, blockHashes = 3, minContainment = 0.5)
      }
      timed("full query plan only") {
        full.queryExecution.executedPlan
      }
      timed("full query execute")(noop(full))
      spark.catalog.clearCache()
      // sketch build alone (same expression the operator persists)
      val sk = docs.select(col("doc_id").as("id"),
        org.apache.spark.sql.GraftSqlBridge.column(
          graft.functions.BottomKMd5(
            org.apache.spark.sql.GraftSqlBridge.expression(
              graft.llm.Dedup.shingles(col("text"), 3)), 12)).as("bk"))
        .persist()
      timed("sketch build only")(noop(sk))
      // blocking window stage (bucket-size cap)
      import org.apache.spark.sql.expressions.Window
      val blk = sk.select(col("id"),
        explode(slice(col("bk"), 1, 3)).as("h"))
      val wH = Window.partitionBy(col("h"))
      val bounded = blk.withColumn("bSize", count(lit(1)).over(wH))
        .filter(col("bSize") <= 1000).drop("bSize")
      timed("bounded window")(noop(bounded))
      val cand = bounded.select(col("h"), col("id").as("id_a"))
        .join(bounded.select(col("h"), col("id").as("id_b")), Seq("h"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b")).dropDuplicates("id_a", "id_b")
      timed("cand self-join+dedupe")(noop(cand))
      val paired = cand
        .join(sk.select(col("id").as("id_a"), col("bk").as("bka")), Seq("id_a"))
        .join(sk.select(col("id").as("id_b"), col("bk").as("bkb")), Seq("id_b"))
      timed("attach sketches")(noop(paired))
      val withMu = paired
        .withColumn("mu",
          slice(array_sort(array_distinct(concat(col("bka"), col("bkb")))), 1, 12))
        .withColumn("union_k", size(col("mu")))
        .withColumn("inter_k", size(filter(col("mu"),
          h => array_contains(col("bka"), h) && array_contains(col("bkb"), h))))
        .withColumn("in_a", size(filter(col("mu"),
          h => array_contains(col("bka"), h))))
        .withColumn("in_b", size(filter(col("mu"),
          h => array_contains(col("bkb"), h))))
      timed("mu tail")(noop(withMu))
      println(s"cand rows: ${cand.count()}")
      sk.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
