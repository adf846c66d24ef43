package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-string self-join: all pairs within Levenshtein distance 1,
  * via the deletion-neighborhood blocking scheme (each string keys on
  * itself plus every one-character deletion; any pair within distance 1
  * shares a key - substitution at i collides on "both delete position i",
  * insert/delete collide on "longer deletes the inserted char" - so the
  * candidate set is COMPLETE below the `maxDf` posting cut (a pair is
  * only droppable when every key it shares exceeds the cut), unlike
  * prefix blocking, which misses edits inside the prefix. Candidates
  * are verified with the exact `levenshtein` before emission. The
  * q_fuzzy_pairs oracle recomputes the SAME blocking including the cut,
  * so Spark and oracle stay in lockstep at any scale.
  *
  * The near-miss-identifier QC step (gene symbols differing by one
  * character, user handles with a typo) - reference symbol QC
  * (AgrLoader.java qcHumanSymbols) compares case-insensitively; this is
  * the fuzzy generalization.
  *
  * Scale: |s|+1 keys per row, join payload is (key, id, string) - an
  * equi-join, never a cartesian. Hot keys (e.g. "" shared by every
  * 1-char string, boilerplate identifiers) are bounded by the `maxDf`
  * posting cut, the same guard as [[graft.llm.Dedup.jaccardPairsExact]]:
  * a key shared by f strings costs f^2 candidates, and a key above the
  * cut can only be hot because many near-identical strings exist -
  * treat those with exact dedup first. */
object FuzzyJoin {

  private[operators] def deletionKeys(s: Column): Column = {
    val dels = transform(sequence(lit(1), length(s)),
      i => concat(s.substr(lit(1), i - 1),
        s.substr(i + 1, length(s) - i)))
    // array_distinct: a string can produce the same deletion twice
    // (aa -> a) - deduped per-row, map-side, no shuffle
    array_distinct(concat(array(s), when(length(s) > 0, dels)
      .otherwise(array().cast("array<string>"))))
  }

  def levenshteinPairs(df: DataFrame, idCol: String = "id",
                       strCol: String = "name",
                       maxDf: Int = 1000): DataFrame = {
    val keyed = df.select(col(idCol).as("id"), col(strCol).as("s"))
      .select(col("id"), col("s"), explode(deletionKeys(col("s"))).as("k"))
    val wK = Window.partitionBy(col("k"))
    val kept = keyed.withColumn("df", count(lit(1)).over(wK))
      .filter(col("df") <= maxDf).drop("df")
    val a = kept.select(col("k"), col("id").as("id_a"), col("s").as("s_a"))
    val b = kept.select(col("k"), col("id").as("id_b"), col("s").as("s_b"))
    a.join(b, Seq("k"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("s_a"), col("s_b")).distinct()
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .filter(col("dist") <= 1)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
