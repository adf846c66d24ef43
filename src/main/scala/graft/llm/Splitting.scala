package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting by content hash.
  *
  * Train/val/test assignment must be a pure function of the example (not
  * of row order, partitioning, or a sampling seed), or re-running the
  * pipeline reshuffles the split and leaks val/test into training.
  * Bucketing on the first md5 byte of the content gives 256 stable
  * buckets; the split is a string-range comparison on the hex bucket, so
  * any engine that can md5 reproduces the assignment exactly.
  *
  * Defaults: bucket < "cc" -> train (204/256 = 79.7%), < "e6" -> val
  * (26/256 = 10.2%), else test (10.2%). A pure map stage - no shuffle,
  * no sampling, no driver state.
  */
object Splitting {

  def assignSplit(df: DataFrame, contentCol: String = "text",
                  trainUpperHex: String = "cc",
                  valUpperHex: String = "e6"): DataFrame = {
    val bucket = substring(md5(col(contentCol).cast("binary")), 1, 2)
    df.withColumn("split_bucket", bucket)
      .withColumn("split",
        when(bucket < trainUpperHex, "train")
          .when(bucket < valUpperHex, "val")
          .otherwise("test"))
  }
}
