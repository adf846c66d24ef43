package graft.llm

import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.functions._

import graft.functions.UnigramSegment

/** Unigram-LM (SentencePiece-class) tokenizer: Viterbi apply under a
  * (piece, integer cost) vocabulary, and EM-style training (seed-piece
  * induction + segment/recount/prune rounds) - the tokenizer family
  * behind Llama/T5/Gemma artifacts, completing the engine's set next
  * to word-BPE, byte-BPE, and WordPiece.
  *
  * Scale shape (identical to the other tokenizers): the corpus
  * collapses to the DISTINCT-word frame before any per-character work,
  * the native [[graft.functions.UnigramSegment]] expression is the
  * only per-word cost (vocabulary attached as plan-time model state,
  * no join), and the only corpus-sized stages are the tokenize
  * explode, one equi-join against the segmented word frame, and the
  * per-doc reassembly aggregation. Training keeps ONLY model-sized
  * state on the driver between rounds (the k-means-centroid pattern:
  * <= keepTop + alphabet rows per collect); every corpus-sized count
  * is a distributed aggregation.
  */
object Unigram {

  /** Default fallback cost for a single code point absent from the
    * vocabulary (the published unigram <unk> path: high, so real
    * pieces win whenever one covers the character). */
  val DefaultUnkCost = 100000L

  /** Integer-quantized negative log-prob: round(-1000 ln(n/total)).
    * The one non-integer step of training; quantization at 1e-3 nats
    * makes the DP itself pure-integer, and a cross-engine mismatch
    * would need ln() to land within ~1e-10 of a rounding boundary
    * (the same accepted-margin convention as the ANN oracle dots). */
  def costOf(n: Long, total: Long): Long =
    math.round(-1000.0 * math.log(n.toDouble / total.toDouble))

  /** Encode every document: (idCol, n_pieces, n_unk_pieces,
    * pieces_csv) with pieces in reading order; empty/null text keeps
    * its row with zeros and ''. `vocab` is (piece, cost) - costs from
    * [[train]]/[[costOf]] or a shipped artifact. */
  def encode(df: DataFrame, vocab: Seq[(String, Long)],
             unkCost: Long = DefaultUnkCost,
             idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(vocab.nonEmpty, "empty unigram vocabulary")
    val words = df
      .select(explode(TextAnalysis.normalizedWords(col(textCol))).as("w"))
      .distinct()
    val segmented = words.select(col("w"),
        GraftSqlBridge.column(UnigramSegment(
          GraftSqlBridge.expression(col("w")), vocab, unkCost)).as("seg"))
      .select(col("w"),
        size(col("seg.pieces")).as("n_p"),
        col("seg.n_unk").as("unk"),
        array_join(col("seg.pieces"), ",").as("csv"))
    val docs = df
      .select(col(idCol),
        posexplode(TextAnalysis.normalizedWords(col(textCol)))
          .as(Seq("p", "w")))
      .join(segmented, Seq("w"))
      .groupBy(col(idCol))
      .agg(
        sum(col("n_p")).cast("int").as("n_pieces"),
        sum(col("unk")).cast("int").as("n_unk_pieces"),
        array_sort(collect_list(struct(col("p"), col("csv")))).as("__ps"))
      .select(col(idCol), col("n_pieces"), col("n_unk_pieces"),
        array_join(transform(col("__ps"), x => x("csv")), ",").as("pieces_csv"))
    df.select(col(idCol))
      .join(docs, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_pieces"), lit(0)).as("n_pieces"),
        coalesce(col("n_unk_pieces"), lit(0)).as("n_unk_pieces"),
        coalesce(col("pieces_csv"), lit("")).as("pieces_csv"))
  }

  /** EM-style unigram training. Deterministic, SQL-replayable rounds:
    *
    *   - SEED: frequency-weighted counts of every substring (1..
    *     maxPieceLen code points, all positions, overlapping) of the
    *     distinct-word frame; vocabulary = all single code points plus
    *     the top `keepTop` multi-char pieces by (n DESC, piece ASC);
    *     costs via [[costOf]] over the kept total.
    *   - each ROUND r: Viterbi-segment every word under the current
    *     costs (words over the length cap are [UNK] and contribute no
    *     usage), usage(piece) = sum of word frequency over best-path
    *     uses (fallback chars are NOT vocabulary usage), then PRUNE:
    *     keep single chars with usage > 0 and the top (keepTop >> r)
    *     multi-char pieces by (usage DESC, piece ASC); re-derive costs
    *     from the kept usage.
    *
    * Returns the post-round-`rounds` vocabulary as (piece, n) - pure
    * integer output (costs are derivable via [[costOf]]). EVERY prune
    * (seed included) runs distributed through [[prune]]
    * (orderBy+limit = TakeOrdered, no single-partition window, no
    * corpus-sized collect): the seed-substring frame - the one
    * corpus-vocabulary-sized frame of training - is pruned to
    * <= keepTop + alphabet rows BEFORE the driver sees it. */
  def train(df: DataFrame, rounds: Int = 2, maxPieceLen: Int = 5,
            keepTop: Int = 300, unkCost: Long = DefaultUnkCost,
            textCol: String = "text"): DataFrame = {
    require(rounds >= 1 && rounds <= 8, s"rounds $rounds outside [1, 8]")
    require(maxPieceLen >= 2 && keepTop >= 1, "degenerate unigram config")
    val words = df
      .select(explode(TextAnalysis.normalizedWords(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
      .filter(length(col("w")) <= UnigramSegment.MaxWordLen)
    // seed substring counts: one explode of all (pos, len) substrings
    val subs = words.select(col("wc"),
      explode(flatten(transform(
        sequence(lit(1), length(col("w"))), i =>
          transform(
            sequence(lit(1), least(lit(maxPieceLen), length(col("w")) - i + 1)),
            l => col("w").substr(i, l))))).as("piece"))
    val seed = subs.groupBy(col("piece")).agg(sum(col("wc")).as("n"))
    var vocabCounts: Seq[(String, Long)] = collectCounts(prune(seed, keepTop))
    def usageOf(costs: Seq[(String, Long)]): DataFrame = {
      val segd = words.select(col("wc"),
        explode(GraftSqlBridge.column(UnigramSegment(
          GraftSqlBridge.expression(col("w")), costs, unkCost))
          .getField("pieces")).as("piece"))
      val vdf = {
        val spark = df.sparkSession
        import spark.implicits._
        costs.map(_._1).toDF("piece")
      }
      segd.groupBy(col("piece")).agg(sum(col("wc")).as("n"))
        .join(broadcast(vdf), Seq("piece"), "left_semi")
    }
    var r = 1
    while (r < rounds) {
      val costs = withCosts(vocabCounts)
      vocabCounts = collectCounts(prune(usageOf(costs), keepTop >> r))
      r += 1
    }
    // final round: distributed prune, distributed output
    prune(usageOf(withCosts(vocabCounts)), keepTop >> rounds)
      .select(col("piece"), col("n"))
  }

  /** Distributed vocabulary prune: ALL single-code-point pieces (the
    * alphabet - bounded by the corpus character set) plus the top
    * `kMulti` multi-character pieces by (n DESC, piece ASC). The
    * orderBy+limit plans as TakeOrderedAndProject - a distributed
    * top-k, never a global sort or a full collect - so a driver
    * collect of the result is <= kMulti + |alphabet| rows even when
    * the input is the corpus-vocabulary-sized seed-substring frame
    * (billions of distinct <= maxPieceLen-grams on a multilingual
    * corpus; the alphabet is not). Spark's `length` counts code
    * points (UTF8String.numChars), so the singles predicate matches
    * `codePointCount == 1` across surrogate pairs. */
  private[graft] def prune(counts: DataFrame, kMulti: Int): DataFrame = {
    val singles = counts.filter(length(col("piece")) === 1)
    val multi = counts.filter(length(col("piece")) > 1)
      .orderBy(col("n").desc, col("piece").asc).limit(kMulti)
    singles.unionByName(multi)
  }

  /** Driver collect of an already-pruned vocabulary frame (model-sized
    * by [[prune]]'s contract). */
  private def collectCounts(df: DataFrame): Seq[(String, Long)] =
    df.select(col("piece"), col("n")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Costs for a counted vocabulary: [[costOf]] over its own total. */
  def withCosts(counts: Seq[(String, Long)]): Seq[(String, Long)] = {
    val total = counts.map(_._2).sum
    counts.map { case (p, n) => (p, costOf(n, total)) }
  }
}
