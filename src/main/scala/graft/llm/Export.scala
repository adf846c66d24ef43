package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Dataset export: the write side of the prep pipeline. Partitioned
  * parquet layout (`split=train/source=web/...`) so downstream training
  * jobs prune partitions at the scan, with small-files control: the
  * frame is repartitioned BY THE PARTITION COLUMNS first, so every
  * (split, source) value lands in exactly one task and writes exactly
  * one file - without this, every one of the N shuffle partitions
  * writes a sliver of every partition value (N x |values| files; at
  * 1000 executors that is the classic small-files explosion).
  * Rows are sorted within partitions for deterministic file content.
  */
object Export {

  def writePartitioned(df: DataFrame, outDir: String,
                       partitionCols: Seq[String] = Seq("split", "source"),
                       sortCol: String = "doc_id"): Unit =
    df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols :+ sortCol).map(col): _*)
      .write.partitionBy(partitionCols: _*)
      .mode("overwrite").parquet(outDir)
}
