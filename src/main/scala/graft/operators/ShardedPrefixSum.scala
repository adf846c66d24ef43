package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact running sums: the TWO-LEVEL shard prefix sum used
  * by sequence packing ([[graft.llm.Packing]]) and the distributed
  * column profile ([[Profile.summarizeDistributed]]).
  *
  * A naive `sum(x) OVER (PARTITION BY stratum ORDER BY ord)`
  * materializes each stratum in one WindowExec task - a hot stratum
  * ("web" = most of a 100 TB corpus, or one column's whole value
  * domain) serializes through a single reducer. Instead:
  * range-partition on (stratum, ord) into `numShards` contiguous
  * slices, cumsum within each (stratum, shard) slice in parallel,
  * aggregate the tiny per-(stratum, shard) totals (~numShards rows),
  * prefix-sum THOSE on the driver-sized frame, and broadcast the
  * exclusive shard offsets back. Because the shards are contiguous
  * ranges of the (stratum, ord) order, within-shard-cumsum + shard
  * offset equals the global ordered cumsum exactly - the result is
  * invariant to where the range boundaries fall, so AQE coalescing and
  * sampling-determined splits cannot change it. Integer-only
  * arithmetic, bit-stable across engines and re-runs.
  */
object ShardedPrefixSum {

  /** Adds `outCol` = sum of `tokenCol` over rows of the same stratum
    * that precede this row in `orderCol` order (exclusive running
    * offset). Ties on (stratum, order) never split across shards
    * (RangePartitioner is a function of the key), so the result is
    * well-defined per (stratum, order) group even when individual rows
    * within a tie are otherwise unordered.
    * `numShards <= 0` defaults to spark.sql.shuffle.partitions.
    *
    * The input frame is MATERIALIZED ONCE (persist - see the
    * correctness note in the body): pass a narrow projection
    * (id, stratum, token, order), not the full corpus row - every
    * column in `df` is cached for the duration of the query. */
  def cumBefore(df: DataFrame, tokenCol: String,
                strataCol: String, orderCol: String,
                numShards: Int, outCol: String): DataFrame =
    cumBefore(df, tokenCol, strataCol, Seq(orderCol), numShards, outCol)

  /** Composite-order variant: the running order is the lexicographic
    * (orderCols...) ascending order within each stratum - same
    * two-level topology, with the range partition and both window
    * passes keyed on the full column list. Use a negated column for a
    * descending component (keeps the single code path). */
  def cumBefore(df: DataFrame, tokenCol: String,
                strataCol: String, orderCols: Seq[String],
                numShards: Int, outCol: String): DataFrame = {
    require(orderCols.nonEmpty, "cumBefore needs at least one order column")
    val shards =
      if (numShards > 0) numShards
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // Contiguous-range sharding: spark_partition_id() after a range
    // repartition on (stratum, ord) is monotone in that order, so each
    // (stratum, shard) cell is a contiguous slice of the stratum's
    // stream.
    //
    // The persist is CORRECTNESS, not caching: `ranged` feeds two
    // consumers (the within-shard window and the shard-totals
    // aggregate), and a logical plan is a TREE - the ranged subtree
    // appears twice, so without intervention each consumer compiles
    // its own physical range exchange. RangePartitioner samples its
    // boundaries with an RDD-id-derived seed, so two independent
    // materializations can draw DIFFERENT boundaries - the same row
    // then reads a different spark_partition_id() in each branch and
    // the offset join adds the wrong shard totals. Exchange reuse
    // usually hides this, but it is an optimization, never a
    // guarantee: measured at sf0.1 with 4 shards (sparse boundary
    // sample), the per-stratum budget query drifted 231..266 rows
    // across 15 identical runs, and pinned to the exact 261 once one
    // materialization was shared.
    //
    // persist routes both logical references through the cache
    // manager to ONE InMemoryRelation instance, whose single physical
    // exchange holds a single lazily-created ShuffleDependency - ONE
    // sampled partitioner, shared by construction. Unlike a
    // localCheckpoint pin (which truncates lineage, so an executor
    // loss or dynamic-allocation decommission after materialization
    // kills the job), lost cache blocks here recompute through the
    // SAME dependency and partitioner - cluster-safe. Lifecycle: the
    // cache entry is consumed within the building query; callers that
    // sweep caches (Bench's trim) reclaim it afterwards, and a
    // post-sweep recompilation re-registers it.
    val ranged = df
      .repartitionByRange(shards, (strataCol +: orderCols).map(col): _*)
      .withColumn("__pfx_shard", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wIn = Window
      .partitionBy(col(strataCol), col("__pfx_shard"))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = sum(col(tokenCol)).over(wIn) - col(tokenCol)
    // Per-(stratum, shard) totals: at most `shards` + |strata| rows -
    // driver-sized regardless of input size.
    val totals = ranged
      .groupBy(col(strataCol).as("__pfx_strata"),
        col("__pfx_shard").as("__pfx_shard_t"))
      .agg(sum(col(tokenCol)).as("__pfx_tot"))
    val wOff = Window
      .partitionBy(col("__pfx_strata"))
      .orderBy(col("__pfx_shard_t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("__pfx_off",
        coalesce(sum(col("__pfx_tot")).over(wOff), lit(0L)))
      .drop("__pfx_tot")
    ranged
      .join(broadcast(offsets),
        col(strataCol) <=> col("__pfx_strata") &&
          col("__pfx_shard") === col("__pfx_shard_t"),
        "left")
      .withColumn(outCol, within + col("__pfx_off"))
      .drop("__pfx_strata", "__pfx_shard_t", "__pfx_off",
        "__pfx_shard")
  }
}
