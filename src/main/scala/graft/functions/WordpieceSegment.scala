package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native WordPiece segmentation (BERT-style greedy longest-match-
  * first): a word splits into the longest vocabulary piece at each
  * position - continuation pieces carry the `##` prefix - and a word
  * with NO matching piece at any position becomes a single `[UNK]`,
  * matching the published WordPiece tokenizer exactly, including its
  * max_input_chars_per_word guard (words longer than
  * [[WordpieceSegment.MaxInputChars]] CODE POINTS become `[UNK]`
  * without paying the O(len x maxPieceLen) scan). Iteration is by
  * Unicode code point - piece lengths, the cap, and substring probes
  * all count code points, the same semantics as the DuckDB oracle's
  * `length`/`substr` - so non-BMP text segments identically in both
  * engines. The vocabulary is plan-time model state shared per
  * executor (the [[BpeSegment]] pattern). Participates in whole-stage
  * codegen via `defineCodeGen`. */
case class WordpieceSegment(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val model = new WordpieceSegment.Model(vocab.toArray)

  override protected def nullSafeEval(input: Any): Any =
    WordpieceSegment.segmentData(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("wpModel", model,
      classOf[WordpieceSegment.Model].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordpieceSegment.segmentData($c, $modelRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "wordpiece_segment"
}

object WordpieceSegment {

  val Unk = "[UNK]"

  /** Published WordPiece word-length circuit breaker
    * (max_input_chars_per_word in the BERT reference tokenizer): words
    * longer than this many code points become [UNK] outright, bounding
    * the per-word probe cost against pathological inputs. */
  val MaxInputChars = 100

  /** Piece tables built once per executor: start pieces (no `##`) and
    * continuation pieces (`##`-prefixed) as raw-text -> emitted-token
    * maps, plus each table's max raw length IN CODE POINTS to bound
    * the probe. */
  private[functions] final class Tables(vocab: Array[String]) {
    val starts = new java.util.HashMap[String, String]()
    val conts = new java.util.HashMap[String, String]()
    var maxStart = 0
    var maxCont = 0
    vocab.foreach { tok =>
      if (tok.startsWith("##")) {
        val raw = tok.substring(2)
        if (raw.nonEmpty) {
          conts.put(raw, tok)
          maxCont = math.max(maxCont, raw.codePointCount(0, raw.length))
        }
      } else if (tok.nonEmpty) {
        starts.put(tok, tok)
        maxStart = math.max(maxStart, tok.codePointCount(0, tok.length))
      }
    }
  }

  /** Executor-shared vocabulary. Only `vocab` serializes: the tables
    * live behind a single @transient lazy field (a tuple-pattern lazy
    * val would leave the synthesized backing field non-transient) and
    * rebuild per executor. */
  final class Model(val vocab: Array[String]) extends Serializable {
    @transient lazy val tables: Tables = new Tables(vocab)
  }

  def segment(word: String, model: Model): Array[String] = {
    val t = model.tables
    // one code-point array up front: every probe below indexes it, so
    // surrogate pairs cost nothing extra and counts match the oracle
    val cps = word.codePoints().toArray
    val n = cps.length
    if (n > MaxInputChars) return Array(Unk)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < n) {
      val (table, maxL0) =
        if (pos == 0) (t.starts, t.maxStart)
        else (t.conts, t.maxCont)
      var l = math.min(n - pos, maxL0)
      var found: String = null
      while (l >= 1 && found == null) {
        found = table.get(new String(cps, pos, l))
        if (found == null) l -= 1
      }
      if (found == null) return Array(Unk)
      out += found
      pos += l
    }
    out.toArray
  }

  def segmentData(word: UTF8String, model: Model): ArrayData = {
    val toks = segment(word.toString, model)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }
}
