package graft.llm

import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.functions._

import graft.functions.WordpieceSegment

/** WordPiece tokenizer application (BERT family) - the third tokenizer
  * the engine ships next to word-level and byte-level BPE: greedy
  * longest-match-first segmentation against a fixed `##`-convention
  * vocabulary, whole-word `[UNK]` on any unmatched position.
  *
  * Scale shape: identical to the BPE encodes - the corpus collapses to
  * the DISTINCT-word frame before any per-character work, the native
  * [[graft.functions.WordpieceSegment]] expression is the only
  * per-word cost (vocabulary attached as plan-time model state, no
  * join), and the only corpus-sized stages are the tokenize explode,
  * one equi-join against the segmented word frame, and the per-doc
  * reassembly aggregation. */
object Wordpiece {

  /** Encode every document: (idCol, n_pieces, n_unk_words,
    * pieces_csv) with pieces in reading order; empty/null text keeps
    * its row with zeros and ''. */
  def encode(df: DataFrame, vocab: Seq[String], idCol: String = "doc_id",
             textCol: String = "text"): DataFrame = {
    require(vocab.nonEmpty, "empty wordpiece vocabulary")
    val words = df
      .select(explode(TextAnalysis.normalizedWords(col(textCol))).as("w"))
      .distinct()
    val segmented = words.select(col("w"),
      GraftSqlBridge.column(WordpieceSegment(
        GraftSqlBridge.expression(col("w")), vocab)).as("pieces"))
      .withColumn("n_p", size(col("pieces")))
      .withColumn("unk",
        (col("pieces") === array(lit(WordpieceSegment.Unk))).cast("int"))
      .withColumn("csv", array_join(col("pieces"), ","))
    val docs = df
      .select(col(idCol),
        posexplode(TextAnalysis.normalizedWords(col(textCol)))
          .as(Seq("p", "w")))
      .join(segmented, Seq("w"))
      .groupBy(col(idCol))
      .agg(
        sum(col("n_p")).cast("int").as("n_pieces"),
        sum(col("unk")).cast("int").as("n_unk_words"),
        array_sort(collect_list(struct(col("p"), col("csv")))).as("__ps"))
      .select(col(idCol), col("n_pieces"), col("n_unk_words"),
        array_join(transform(col("__ps"), x => x("csv")), ",").as("pieces_csv"))
    df.select(col(idCol))
      .join(docs, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_pieces"), lit(0)).as("n_pieces"),
        coalesce(col("n_unk_words"), lit(0)).as("n_unk_words"),
        coalesce(col("pieces_csv"), lit("")).as("pieces_csv"))
  }
}
