package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** Throwaway probe: decompose minhashLshPairs cost. */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // warm
    docs.select(count(lit(1))).collect()

    timed("shingles only") {
      docs.select(Dedup.shingles($"text", 3).as("sh"))
        .write.format("noop").mode("overwrite").save()
    }
    timed("shingles+sig") {
      docs.select(Dedup.minhashSignature(Dedup.shingles($"text", 3), 64).as("sig"))
        .write.format("noop").mode("overwrite").save()
    }
    for (i <- 1 to 2) timed(s"full pairs #$i") {
      Dedup.minhashLshPairs(docs).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
