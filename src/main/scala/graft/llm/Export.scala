package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset export: the write side of the prep pipeline. Partitioned
  * parquet layout (`split=train/source=web/...`) so downstream training
  * jobs prune partitions at the scan, with BOTH small-files control and
  * write parallelism:
  *
  *   - Naive `write.partitionBy` lets every one of the N shuffle tasks
  *     write a sliver of every partition value (N x |values| files; at
  *     1000 executors that is the classic small-files explosion).
  *   - Repartitioning by the partition columns alone (the previous
  *     design) bounds files at one per value but ALSO caps write
  *     parallelism at |values|: at 100 TB with ~6 (split, source)
  *     values the whole corpus funnels through ~6 writer tasks.
  *
  * The fix is a salted repartition: a per-value row count (column-pruned
  * scan, map-side combine) derives `buckets = ceil(rows / target)` per
  * value, broadcast back onto the frame (null-safe join so null
  * partition values survive), and the shuffle key is
  * (partitionCols..., pmod(hash(sortCol), buckets)). A small value has
  * buckets=1 and still writes exactly one file; an oversized value
  * spreads across `buckets` parallel tasks and writes at most `buckets`
  * files - bounded files AND scalable writers. Rows are sorted within
  * partitions for deterministic file content (the salt is a
  * deterministic hash, so re-runs produce identical files).
  */
object Export {

  def writePartitioned(df: DataFrame, outDir: String,
                       partitionCols: Seq[String] = Seq("split", "source"),
                       sortCol: String = "doc_id",
                       targetRowsPerFile: Long = 4L * 1000 * 1000): Unit = {
    require(targetRowsPerFile > 0, "targetRowsPerFile must be positive")
    // Per-value bucket counts: tiny frame (|distinct partition values|
    // rows), safe to broadcast. Keys renamed so the join-back stays
    // unambiguous and null-safe (<=>) - a null partition value becomes
    // __HIVE_DEFAULT_PARTITION__ on disk, it must not be dropped here.
    val keyCols = partitionCols.map(c => col(c).as(s"__k_$c"))
    val buckets = df.groupBy(partitionCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .select(keyCols :+
        greatest(lit(1L), ceil(col("__n") / targetRowsPerFile.toDouble))
          .cast("int").as("__buckets"): _*)
      .persist() // used twice: total-bucket scalar + the salt join
    // Explicit shuffle-partition count: without it AQE coalesces small
    // shuffles back to one partition, silently restoring the one-task
    // ceiling this method exists to remove. 2x headroom over the total
    // bucket count keeps hash collisions between (value, salt) combos
    // rare; per-value file count stays <= buckets regardless (each
    // combo lands in exactly one shuffle partition).
    try {
      // sum() over an EMPTY frame yields one null row - coalesce so an
      // empty dataset still writes cleanly (empty parquet + metadata)
      val totalBuckets = buckets
        .agg(coalesce(sum(col("__buckets")), lit(0L)))
        .head().getLong(0).toInt
      val joinCond = partitionCols
        .map(c => col(c) <=> col(s"__k_$c")).reduce(_ && _)
      // LEFT join + coalesce(1): if a partition column is nondeterministic
      // (rand/uuid/time-derived) a value seen only by the write pass has
      // no bucket row; an inner join would silently drop those rows.
      val salted = df.join(broadcast(buckets), joinCond, "left")
        .drop(partitionCols.map(c => s"__k_$c"): _*)
        .withColumn("__salt",
          pmod(hash(col(sortCol)), coalesce(col("__buckets"), lit(1))))
      salted
        .repartition(math.max(1, 2 * totalBuckets),
          partitionCols.map(col) :+ col("__salt"): _*)
        .sortWithinPartitions((partitionCols :+ sortCol).map(col): _*)
        .drop("__buckets", "__salt")
        .write.partitionBy(partitionCols: _*)
        .mode("overwrite").parquet(outDir)
    } finally buckets.unpersist()
  }
}
