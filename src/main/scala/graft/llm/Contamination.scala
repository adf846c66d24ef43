package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark-contamination screening: which training documents contain
  * word n-grams of a held-out evaluation set?
  *
  * The standard decontamination pass (GPT-3 appendix C / PaLM style):
  * shingle both corpora into word n-grams, join on the shingle, and
  * score each (train doc, benchmark doc) pair by the number of DISTINCT
  * shared n-grams. Pairs above `minOverlap` are flagged for removal.
  *
  * Scale shape: explode -> equi-join -> count aggregation. Both sides
  * are deduped per document BEFORE the join (array_distinct), so the
  * join carries each (doc, shingle) once; the benchmark side is tiny by
  * construction (eval sets are ~1e3-1e5 docs vs 1e9 training docs) and
  * broadcasts. With `hashed = true` the join key is the shingle's
  * xxhash64 instead of the string - same pairs (modulo 2^-64 collisions),
  * ~10x narrower shuffle rows; the registered query runs `hashed = false`
  * so the DuckDB oracle can recompute it, and a unit test pins
  * hashed == unhashed on real text.
  */
object Contamination {

  /** One row per (doc id, distinct word n-gram). */
  private def shingles(df: DataFrame, idCol: String, textCol: String,
                       n: Int, hashed: Boolean): DataFrame = {
    val grams = transform(
      sequence(lit(1), size(col("__w")) - (n - 1)),
      i => concat_ws(" ", slice(col("__w"), i, lit(n))))
    val key: Column => Column = if (hashed) (c: Column) => xxhash64(c) else identity
    df.select(col(idCol), TextAnalysis.normalizedWords(col(textCol)).as("__w"))
      // docs shorter than n words have no n-grams; without this guard
      // sequence(1, size-(n-1)) counts DOWN (Spark auto-steps -1) and
      // slice(_, 0, n) throws
      .filter(size(col("__w")) >= n)
      .select(col(idCol), explode(array_distinct(grams)).as("__g"))
      .select(col(idCol), key(col("__g")).as("shingle"))
  }

  /** Score (train, benchmark) pairs by distinct shared n-grams; keep
    * pairs with at least `minOverlap`. */
  def ngramOverlap(train: DataFrame, bench: DataFrame,
                   trainId: String = "doc_id", benchId: String = "bench_id",
                   textCol: String = "text", n: Int = 3,
                   minOverlap: Int = 2, hashed: Boolean = true): DataFrame = {
    val t = shingles(train, trainId, textCol, n, hashed)
    val b = broadcast(shingles(bench, benchId, textCol, n, hashed))
    t.join(b, Seq("shingle"))
      .groupBy(col(trainId), col(benchId))
      .agg(count(lit(1)).as("n_shared")) // inputs deduped -> count = distinct
      .filter(col("n_shared") >= minOverlap)
  }

  /** Semantic (embedding-space) contamination screen - the complement
    * of [[ngramOverlap]] for paraphrased or re-worded eval leakage that
    * shares no literal n-gram: flag a corpus row when ANY benchmark
    * embedding is cosine-similar above `threshold`. Each corpus row
    * probes its `nprobe` nearest IVF cells ([[graft.llm.Ann.probeCellsCol]],
    * the same per-row multi-probe as knnJoin, so a benchmark vector
    * just across a cell boundary is still found); benchmark rows are
    * assigned one cell each and BROADCAST (eval sets are ~1e3-1e5 rows
    * vs 1e9+ corpus rows), so the candidate pass over the corpus is
    * map-side; the only shuffle of the big side is the final
    * flag-attach join on the id (hits are not provably small, so they
    * do not broadcast). Every corpus row surfaces exactly once:
    * (corpusId, contaminated 0/1); null corpus embeddings screen
    * clean. */
  def semanticScreen(corpus: DataFrame, bench: DataFrame,
                     centroids: Seq[Seq[Double]], threshold: Double,
                     nprobe: Int = 2,
                     corpusId: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    require(threshold > 0,
      s"threshold=$threshold must be positive (zero-norm rows compare at 0)")
    val probed = corpus.filter(col(vecCol).isNotNull)
      .select(col(corpusId).as("id"), col(vecCol).as("__qv"))
      .withColumn("cell",
        explode(Ann.probeCellsCol(col("__qv"), centroids, nprobe)))
    val benchCells = Ann.ivfAssign(bench.filter(col(vecCol).isNotNull),
        centroids, vecCol)
      .select(col(vecCol).as("__bv"), col("ivf_cell").as("__bcell"))
    // LEFT SEMI against the broadcast bench: one witness flags the row,
    // so no (corpus x bench) candidate set is ever materialized; the
    // distinct collapses the nprobe probe rows per id
    val hits = probed.join(broadcast(benchCells),
        col("cell") === col("__bcell") &&
          Ann.cosine(col("__qv"), col("__bv")) >= threshold, "left_semi")
      .select(col("id")).distinct().withColumn("__hit", lit(1))
    corpus.select(col(corpusId).as("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id").as(corpusId),
        col("__hit").isNotNull.cast("int").as("contaminated"))
  }
}
