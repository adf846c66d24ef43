package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  * Scale shape: one window cumulative sum per stratum - a single
  * shuffle on the stratum key, then a per-partition running sum. The
  * stratum HAS to bound partition size (a running offset is inherently
  * sequential within a stratum); for a mono-source corpus shard
  * upstream (e.g. by file) and pack per shard - bins never need to be
  * globally dense, only locally contiguous. Integer-only arithmetic,
  * so assignment is bit-stable across engines and re-runs.
  */
object Packing {

  def assignBins(df: DataFrame, budgetTokens: Long,
                 tokenCol: String = "n_tokens",
                 strataCol: String = "source",
                 orderCol: String = "doc_id"): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens=$budgetTokens must be positive")
    val w = Window.partitionBy(col(strataCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumBefore = sum(col(tokenCol)).over(w) - col(tokenCol)
    df.withColumn("pack_bin", floor(cumBefore / budgetTokens))
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
    * Scale shape: the same single cumulative-sum window as assignBins
    * (one shuffle on the stratum key) plus a sequence() explode of at
    * most ceil(tokens/seqLen)+1 rows per doc - output is O(total
    * tokens / seqLen + docs), never quadratic. Zero-token docs occupy
    * no span and emit nothing. Integer-only arithmetic, bit-stable
    * across engines and re-runs. */
  def assignChunks(df: DataFrame, seqLen: Long,
                   tokenCol: String = "n_tokens",
                   strataCol: String = "source",
                   orderCol: String = "doc_id"): DataFrame = {
    require(seqLen > 0, s"seqLen=$seqLen must be positive")
    val w = Window.partitionBy(col(strataCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val start = (sum(col(tokenCol)).over(w) - col(tokenCol)).cast("long")
    df.filter(col(tokenCol) > 0)
      .withColumn("tok_start", start)
      .withColumn("tok_end", col("tok_start") + col(tokenCol))
      .withColumn("chunk_id", explode(sequence(
        floor(col("tok_start") / seqLen).cast("long"),
        floor((col("tok_end") - 1) / seqLen).cast("long"))))
      .withColumn("begin_off",
        greatest(col("tok_start") - col("chunk_id") * seqLen, lit(0L)))
      .withColumn("end_off",
        least(col("tok_end") - col("chunk_id") * seqLen, lit(seqLen)))
      .drop("tok_start", "tok_end")
  }
}
