package graft.llm

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.functions._

import graft.functions.BpeSegment

/** Byte-level BPE tokenizer APPLICATION - the GPT-2-class encode path
  * real pretraining corpora ship (ref: the tokenize step feeding the
  * reference's load pipeline is word-keyed; this is the byte-level
  * generalization an LLM data pipeline needs).
  *
  * Differences from the word-level [[TextAnalysis.bpeEncode]] family:
  *   - Pre-tokenization is the GPT-2-class regex split over the RAW
  *     text (no lowercasing, no whitespace collapse): letter runs,
  *     digit runs, and punctuation runs each optionally absorb one
  *     preceding space, and residual whitespace runs are tokens too -
  *     so detokenization is exact. The published GPT-2 pattern's
  *     `\s+(?!\S)` lookahead is dropped (RE2-compatible engines - and
  *     the DuckDB oracle - have no lookarounds); the only divergence
  *     is that a multi-space run stays one whitespace token instead of
  *     donating its last space to the next word, and the contraction
  *     alternates ('s|'t|...) are subsumed by the punctuation class.
  *   - Seed symbols are UTF-8 BYTES (via [[BpeSegment.byteAlphabet]]'s
  *     256-char representative alphabet), not code points: any byte
  *     sequence encodes (byte fallback), so there is NO dropped-word
  *     precondition and NO UNK id - coverage is total by construction.
  *   - Token ids are fixed by the table alone: byte b has id b
  *     (0..255), the i-th merge rule's product has id 256 + i (first
  *     id wins if a later rule re-creates an existing product). A
  *     shipped ~50k-merge artifact therefore applies with stable ids
  *     on ANY corpus, with no train-corpus vocabulary induction step.
  *
  * Merge semantics are EXACTLY [[BpeSegment]]'s sequential-pass order
  * (byteLevel = true), so the same native codegen'd expression - cost
  * independent of table size - is the only per-word work.
  *
  * Scale shape: identical to the word-level encode - the corpus
  * collapses to the DISTINCT-pre-token frame before any per-byte work
  * (natural text repeats pre-tokens heavily; the frame is
  * vocabulary-sized), the fixed-size vocabulary broadcasts, and the
  * only corpus-sized stages are the pre-tokenize explode, one
  * equi-join against the encoded pre-token frame, and the per-doc
  * reassembly aggregation.
  */
object ByteBpe {

  /** GPT-2-class pre-tokenizer, lookaround-free (RE2-compatible).
    * Alternates: space?+letters, space?+digits, space?+punctuation,
    * whitespace run. Matches cover every character, so
    * concat(pre-tokens) == text exactly. */
  val preTokenPattern: String =
    " ?\\p{L}+| ?\\p{N}+| ?[^ \\t\\r\\n\\x0B\\f\\p{L}\\p{N}]+|[ \\t\\r\\n\\x0B\\f]+"

  /** Pre-token array column for a text column (order-preserving). */
  def preTokens(c: Column): Column =
    regexp_extract_all(c, lit(preTokenPattern), lit(0))

  /** The fixed (tok, id) vocabulary a byte-level merge table induces:
    * 256 byte-representative rows (id = byte value) then one row per
    * merge product (id = 256 + rule index, first id wins on a
    * re-created product). Driver-side - the table IS model state. */
  def vocabEntries(merges: Seq[(String, String)]): Seq[(String, Int)] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    BpeSegment.byteAlphabet.zipWithIndex.foreach { case (t, i) =>
      if (!m.contains(t)) m.update(t, i)
    }
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      if (!m.contains(l + r)) m.update(l + r, 256 + i)
    }
    m.toSeq
  }

  /** Byte-level BPE TRAINING: learn `rounds` merges over the
    * byte-representative symbol space - GPT-2-class pre-tokenization
    * (raw text, no lowercasing), UTF-8-byte seed symbols, then the
    * SAME frequency-weighted argmax loop as the word-level
    * [[TextAnalysis.bpeTrain]] (shared via bpeTrainLoopOverSeg), so a
    * corpus can now train AND apply a byte-level tokenizer end-to-end.
    * No dropped-pre-token precondition: the representative alphabet
    * never contains the U+0001 frame separator. Output: (round, left,
    * right, n) over representative-char symbols - directly usable as
    * [[encode]]'s merge table. */
  def train(df: DataFrame, rounds: Int, textCol: String = "text"): DataFrame = {
    require(rounds >= 1 && rounds <= 64, s"rounds $rounds outside [1, 64]")
    val sep = "\u0001"
    val words = df.select(explode(preTokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
    val syms = GraftSqlBridge.column(BpeSegment(
      GraftSqlBridge.expression(col("w")), Nil, byteLevel = true))
    TextAnalysis.bpeTrainLoopOverSeg(words
      .select(col("wc"),
        concat(lit(sep), array_join(syms, sep + sep), lit(sep)).as("seg")),
      rounds)
  }

  /** Encode every document under a byte-level merge table. Output:
    * (idCol, n_tokens int, token_ids array<int> in reading order);
    * null/empty text keeps its row with n_tokens = 0. Total - every
    * document encodes, every byte is covered. */
  def encode(df: DataFrame, merges: Seq[(String, String)],
             idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(merges.forall { case (l, r) => l.nonEmpty && r.nonEmpty },
      "empty symbol in byte-level merge table")
    val spark = df.sparkSession
    import spark.implicits._
    val words = df.select(explode(preTokens(col(textCol))).as("w")).distinct()
    val segmented = words.select(col("w"),
      GraftSqlBridge.column(BpeSegment(
          GraftSqlBridge.expression(col("w")), merges, byteLevel = true))
        .as("toks"))
    val vocab = vocabEntries(merges).toDF("tok", "id")
    val encoded = segmented
      .select(col("w"), posexplode(col("toks")).as(Seq("i", "tok")))
      .join(broadcast(vocab), Seq("tok")) // inner yet total: byte fallback
      .groupBy(col("w"))
      .agg(array_sort(collect_list(struct(col("i"), col("id")))).as("__ps"))
      .select(col("w"), transform(col("__ps"), p => p("id")).as("__ids"))
    val docToks = df
      .select(col(idCol), posexplode(preTokens(col(textCol))).as(Seq("p", "w")))
      .join(encoded, Seq("w"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("p"), col("__ids")))).as("__ps"))
      .select(col(idCol),
        flatten(transform(col("__ps"), x => x("__ids"))).as("token_ids"))
    df.select(col(idCol))
      .join(docToks, Seq(idCol), "left")
      .withColumn("token_ids",
        coalesce(col("token_ids"), array().cast("array<int>")))
      .withColumn("n_tokens", size(col("token_ids")))
      .select(col(idCol), col("n_tokens"), col("token_ids"))
  }

  /** DISTRIBUTED decode: (idCol, token_ids) back to the exact original
    * text - the inverse of [[encode]] by construction (pre-token
    * matches cover every character, the byte alphabet covers every
    * byte). Token ids look up their strings in the broadcast
    * vocabulary, reassemble per document in order, and the native
    * [[graft.functions.ByteBpeDecode]] expression maps representative
    * chars back to UTF-8 bytes in one codegen'd call per row. Empty
    * id arrays decode to ""; an id missing from the vocabulary raises
    * (never silent truncation). Same two-shuffle reassembly shape as
    * encode; nothing driver-side. */
  def decode(encoded: DataFrame, merges: Seq[(String, String)],
             idCol: String = "doc_id", idsCol: String = "token_ids",
             outCol: String = "text_decoded"): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val vocab = vocabEntries(merges).map(_.swap).toDF("id", "tok")
    // LEFT join + raise: an id outside the table (corrupted input,
    // wrong merge table) must surface as an error, not decode to
    // silently truncated text - the distributed twin of decodeIds'
    // require. raise_error's NullType branch coerces to string.
    val parts = encoded
      .select(col(idCol), posexplode(col(idsCol)).as(Seq("p", "id")))
      .join(broadcast(vocab), Seq("id"), "left")
      .withColumn("tok", when(col("tok").isNull,
          raise_error(concat(lit("byte-BPE decode: token id "),
            col("id").cast("string"), lit(" not in the vocabulary of "),
            lit(vocabEntries(merges).size), lit(" entries"))))
        .otherwise(col("tok")))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("p"), col("tok")))).as("__ps"))
      .select(col(idCol),
        GraftSqlBridge.column(graft.functions.ByteBpeDecode(
          GraftSqlBridge.expression(
            array_join(transform(col("__ps"), x => x("tok")), ""))))
          .as(outCol))
    encoded.select(col(idCol))
      .join(parts, Seq(idCol), "left")
      .withColumn(outCol, coalesce(col(outCol), lit("")))
  }

  /** Driver-side decode (tests / spot checks): token ids back to the
    * exact original string - id -> token string -> representative
    * chars -> bytes -> UTF-8. Inverse of [[encode]] by construction
    * since pre-token matches cover every character. */
  def decodeIds(ids: Seq[Int], merges: Seq[(String, String)]): String = {
    val byId = vocabEntries(merges).map(_.swap).toMap
    val repr = ids.map(byId).mkString
    val bytes = repr.map { ch =>
      val b = BpeSegment.byteOfChar.get(String.valueOf(ch))
      require(b != null, s"char ${ch.toInt} not a byte representative")
      b.toByte
    }.toArray
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }
}
