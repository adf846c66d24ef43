package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level breakdown of the multimodal pair queries: codec+hash
  * pipeline vs blocking/verify join (r16 instrumentation). */
object MmProbe {
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

    for (iter <- 1 to 2) {
      println(s"--- iteration $iter")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .repartition(32, col("doc_id"))
      val base = docs.select(col("doc_id").cast("long").as("asset_id"),
        graft.llm.Multimodal.blockNoiseImageBytes(
          col("doc_id"), 16, 16, 2, "png").as("bytes"))
      val planted = docs.filter(col("doc_id") % 50 === 0)
        .select((-col("doc_id") - 1L).cast("long").as("asset_id"),
          graft.llm.Multimodal.blockNoiseImageBytes(
            col("doc_id"), 16, 16, 2, "bmp").as("bytes"))
      timed("image bytes only")(noop(base.unionByName(planted)))
      val hashed = graft.llm.Multimodal
        .withImagePHash(base.unionByName(planted))
        .select(col("asset_id"), col("phash"))
      timed("image hash pipeline")(noop(hashed))
      val cached = hashed.persist()
      timed("hash materialize")(noop(cached))
      timed("pairs from cached hashes")(noop(
        graft.llm.Multimodal.phashPairsFromHashes(cached, maxHamming = 2)))
      timed("pairs full (uncached)")(noop(
        graft.llm.Multimodal.phashPairsFromHashes(hashed, maxHamming = 2)))
      cached.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
