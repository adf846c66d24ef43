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
}
