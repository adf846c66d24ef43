package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fill-in-the-middle (FIM) training transform - the document
  * rearrangement infilling-capable models train on (Bavarian et al.
  * 2022; the StarCoder / Code Llama data pipelines apply it to ~half
  * the corpus): pick two cut points, move the middle span to the end
  * behind sentinel tokens, so the model learns to generate a middle
  * conditioned on prefix AND suffix.
  *
  * Everything is a pure function of the document content via md5 draws
  * (the [[Splitting]] determinism convention - no RNG, identical in
  * any engine):
  *   - a document participates iff it has >= 2 words and its apply
  *     draw falls under `rate` (ppm cutoff);
  *   - two cut draws in [1, n-1] become i = min, j = max (i == j gives
  *     an empty middle - kept, matching the reference implementations
  *     which train on empty infills);
  *   - a mode draw picks PSM ([PRE] p [SUF] s [MID] m) or SPM
  *     ([SUF] s [PRE] p [MID] m) with equal probability.
  * Non-participating documents pass through verbatim-normalized with
  * mode 'none' (the operator works in normalized word space like every
  * text surface here). Sentinels are word-level literals; a tokenizer
  * maps them to special ids downstream.
  *
  * Scale shape: map-only - one projection over the corpus, no shuffle,
  * no window, nothing driver-side; the cut arithmetic and slices are
  * all codegen'd column expressions. */
object Fim {

  val PreTok = "<fim_pre>"
  val SufTok = "<fim_suf>"
  val MidTok = "<fim_mid>"

  private def draw(textCol: Column, tag: String): Column =
    conv(substring(md5(concat(textCol, lit("|fim|" + tag))), 1, 12), 16, 10)
      .cast("long")

  def fimTransform(df: DataFrame, rate: Double = 0.5,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate $rate outside [0, 1]")
    val cutoff = math.round(rate * 1000000L)
    val t = col(textCol)
    val ws = TextAnalysis.normalizedWords(t)
    val n = size(ws)
    val applied = (n >= 2) && (pmod(draw(t, "apply"), lit(1000000L)) < cutoff)
    val span = greatest((n - 1).cast("long"), lit(1L)) // no mod-0 on n<2
    val c1 = pmod(draw(t, "c1"), span) + 1L
    val c2 = pmod(draw(t, "c2"), span) + 1L
    val i = least(c1, c2).cast("int")
    val j = greatest(c1, c2).cast("int")
    val pre = slice(ws, lit(1), i)
    val mid = slice(ws, i + 1, j - i)
    val suf = slice(ws, j + 1, n - j)
    val spm = pmod(draw(t, "mode"), lit(2L)) === 1L
    val psmToks = concat(array(lit(PreTok)), pre, array(lit(SufTok)), suf,
      array(lit(MidTok)), mid)
    val spmToks = concat(array(lit(SufTok)), suf, array(lit(PreTok)), pre,
      array(lit(MidTok)), mid)
    df.select(
      col(idCol),
      when(applied, when(spm, "spm").otherwise("psm")).otherwise("none")
        .as("fim_mode"),
      when(applied, size(pre)).otherwise(lit(0)).as("n_prefix"),
      when(applied, size(mid)).otherwise(lit(0)).as("n_middle"),
      when(applied, size(suf)).otherwise(lit(0)).as("n_suffix"),
      when(applied, array_join(when(spm, spmToks).otherwise(psmToks), " "))
        .otherwise(array_join(ws, " "))
        .as("fim_text"))
  }
}
