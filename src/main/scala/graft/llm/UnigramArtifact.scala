package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer artifact persistence - [[BpeArtifact]]'s twin
  * for the SentencePiece family: the trained `(piece, n)` vocabulary
  * ([[Unigram.train]]'s output) as one parquet table, reloadable into
  * the `(piece, cost)` shape [[Unigram.encode]] consumes. Counts, not
  * costs, are what's persisted: they are pure integers (exact across
  * engines and file round trips), and costs re-derive via
  * [[Unigram.withCosts]] - the same convention train itself uses
  * between rounds. A shipped `.model`-style artifact therefore encodes
  * NEW corpora with segmentations fixed at train time.
  *
  * Scale: the table is model-sized (vocabulary entries, never
  * corpus-sized), so the single-file coalesce is free and the load is
  * a driver-cheap broadcast source - the vocabulary attaches to
  * [[graft.functions.UnigramSegment]] as plan-time model state.
  */
object UnigramArtifact {

  def save(vocabCounts: DataFrame, dir: String): Unit =
    vocabCounts.select(col("piece"), col("n").cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/unigram_vocab")

  /** The persisted counts as (piece, cost) - driver-side model state,
    * sorted for a deterministic plan-time vocabulary order. */
  def loadCosts(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    import spark.implicits._
    val counts = spark.read.parquet(s"$dir/unigram_vocab")
      .select(col("piece"), col("n"))
      .as[(String, Long)].collect().toSeq.sortBy(_._1)
    Unigram.withCosts(counts)
  }

  /** Train on `df`, persist the vocabulary. Returns the vocabulary
    * size for caller-side logging. */
  def trainAndSave(df: DataFrame, rounds: Int, dir: String,
                   textCol: String = "text"): Long = {
    val vocab = Unigram.train(df, rounds, textCol = textCol)
    save(vocab, dir)
    vocab.count()
  }
}
