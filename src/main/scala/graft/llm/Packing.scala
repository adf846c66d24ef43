package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic sequence packing: group documents into fixed
  * token-budget bins (the pre-training batching step - concatenate docs
  * until ~budget tokens, start the next bin).
  *
  * Assignment is next-fit by token offset: within each stratum, docs
  * are laid out in `orderCol` order and a doc belongs to the bin its
  * START offset falls in (`floor(cum_tokens_before / budget)`). A bin
  * can overflow by at most one document's tokens (the straddler stays
  * in the bin it started in); real packers then truncate or wrap the
  * straddler, which is a per-bin local decision downstream.
  *
  * Scale shape: the running offset is a TWO-LEVEL prefix sum, not a
  * single per-stratum window. A naive
  * `sum(tokens) OVER (PARTITION BY stratum ORDER BY ord)` materializes
  * each stratum in one WindowExec task - a hot stratum ("web" = most of
  * a 100 TB corpus) serializes through a single reducer. Instead:
  * range-partition on (stratum, ord) into `numShards` contiguous
  * slices, cumsum within each (stratum, shard) slice in parallel,
  * aggregate the tiny per-(stratum, shard) token totals (~numShards
  * rows), prefix-sum THOSE on the driver-sized frame, and broadcast the
  * exclusive shard offsets back. Because the shards are contiguous
  * ranges of the (stratum, ord) order, within-shard-cumsum + shard
  * offset equals the global ordered cumsum exactly - the result is
  * invariant to where the range boundaries fall, so AQE coalescing and
  * sampling-determined splits cannot change it. Integer-only
  * arithmetic, bit-stable across engines and re-runs.
  */
object Packing {

  /** Adds `outCol` = sum of `tokenCol` over rows of the same stratum
    * that precede this row in `orderCol` order (exclusive running
    * offset), via the two-level shard prefix sum described above
    * (shared machinery: [[graft.operators.ShardedPrefixSum]]).
    * `numShards <= 0` defaults to spark.sql.shuffle.partitions. */
  private def withCumBefore(df: DataFrame, tokenCol: String,
                            strataCol: String, orderCol: String,
                            numShards: Int, outCol: String): DataFrame =
    graft.operators.ShardedPrefixSum.cumBefore(
      df, tokenCol, strataCol, orderCol, numShards, outCol)

  def assignBins(df: DataFrame, budgetTokens: Long,
                 tokenCol: String = "n_tokens",
                 strataCol: String = "source",
                 orderCol: String = "doc_id",
                 numShards: Int = 0): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens=$budgetTokens must be positive")
    withCumBefore(df, tokenCol, strataCol, orderCol, numShards, "__pack_cum")
      .withColumn("pack_bin", floor(col("__pack_cum") / budgetTokens))
      .drop("__pack_cum")
  }

  /** Concat-and-chunk packing: within each stratum, documents are laid
    * end-to-end in `orderCol` order and the token stream is cut every
    * `seqLen` tokens - the pretraining batch shape where one document
    * can straddle chunk boundaries (each chunk is a fixed-length
    * training sequence; a straddling document contributes a span to
    * each chunk it crosses). Unlike [[assignBins]] (next-fit, one bin
    * per doc, bins may overflow), chunks here are EXACTLY `seqLen`
    * tokens and a doc maps to one row per chunk it touches, carrying
    * the in-chunk token range [begin_off, end_off) of its slice -
    * enough for a downstream writer to materialize sequences and
    * attention-mask segment boundaries.
    *
    * Scale shape: the same two-level shard prefix sum as [[assignBins]]
    * (parallel within-shard windows + broadcast shard offsets - no
    * single-task-per-stratum window) plus a sequence() explode of at
    * most ceil(tokens/seqLen)+1 rows per doc - output is O(total
    * tokens / seqLen + docs), never quadratic. Zero-token docs occupy
    * no span and emit nothing. Integer-only arithmetic, bit-stable
    * across engines and re-runs. */
  def assignChunks(df: DataFrame, seqLen: Long,
                   tokenCol: String = "n_tokens",
                   strataCol: String = "source",
                   orderCol: String = "doc_id",
                   numShards: Int = 0): DataFrame = {
    require(seqLen > 0, s"seqLen=$seqLen must be positive")
    withCumBefore(df.filter(col(tokenCol) > 0), tokenCol, strataCol,
        orderCol, numShards, "__pack_cum")
      .withColumn("tok_start", col("__pack_cum").cast("long"))
      .withColumn("tok_end", col("tok_start") + col(tokenCol))
      .withColumn("chunk_id", explode(sequence(
        floor(col("tok_start") / seqLen).cast("long"),
        floor((col("tok_end") - 1) / seqLen).cast("long"))))
      .withColumn("begin_off",
        greatest(col("tok_start") - col("chunk_id") * seqLen, lit(0L)))
      .withColumn("end_off",
        least(col("tok_end") - col("chunk_id") * seqLen, lit(seqLen)))
      .drop("tok_start", "tok_end", "__pack_cum")
  }
}
