package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tokenizer-artifact persistence: the trained merge table
  * ([[TextAnalysis.bpeTrain]]'s `(round, left, right, n)`) plus the
  * induced vocabulary ([[TextAnalysis.bpeVocab]]'s `(tok, id)`) as two
  * parquet tables under one directory - the train -> ship -> encode
  * round trip a tokenizer pipeline needs across sessions. Encoding a
  * NEW corpus under a loaded artifact via
  * [[TextAnalysis.bpeEncodeWithVocab]] yields ids fixed at train time,
  * independent of the new corpus's characters.
  *
  * Scale: both tables are model-sized (rules + vocab entries, never
  * corpus-sized), so the single-file coalesce is free and the load is
  * a driver-cheap broadcast source.
  */
object BpeArtifact {

  def save(merges: DataFrame, vocab: DataFrame, dir: String): Unit = {
    merges.select(col("round").cast("int"), col("left"), col("right"),
        col("n").cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/merges")
    vocab.select(col("tok"), col("id").cast("int"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/vocab")
  }

  /** The merge rules in round order - the shape
    * [[TextAnalysis.bpeEncodeWithVocab]] consumes. Driver-side model
    * state, like the trained table itself. */
  def loadMergeRules(spark: SparkSession, dir: String): Seq[(String, String)] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/merges")
      .select(col("round").cast("int"), col("left"), col("right"))
      .as[(Int, String, String)].collect().toSeq.sortBy(_._1)
      .map { case (_, l, r) => (l, r) }
  }

  def loadVocab(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/vocab").select(col("tok"), col("id"))

  /** Train on `df`, induce the vocabulary, persist both. Returns
    * (rule count, vocab size) for caller-side logging. */
  def trainAndSave(df: DataFrame, rounds: Int, dir: String,
                   textCol: String = "text"): (Long, Long) = {
    val merges = TextAnalysis.bpeTrain(df, rounds, textCol)
    val spark = df.sparkSession
    import spark.implicits._
    val rules = merges.select(col("round"), col("left"), col("right"))
      .as[(Int, String, String)].collect().toSeq.sortBy(_._1)
      .map { case (_, l, r) => (l, r) }
    val vocab = TextAnalysis.bpeVocab(df, rules, textCol)
    save(merges, vocab, dir)
    (rules.size.toLong, vocab.count())
  }
}
