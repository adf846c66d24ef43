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
  * matching the published WordPiece tokenizer exactly. The vocabulary
  * is plan-time model state shared per executor (the [[BpeSegment]]
  * pattern); per-word cost is O(len x maxPieceLen) hash probes.
  * Participates in whole-stage codegen via `defineCodeGen`. */
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

  /** Executor-shared vocabulary: start pieces (no `##`) and
    * continuation pieces (`##`-prefixed) as raw-text -> emitted-token
    * maps, plus each table's max raw length to bound the probe. Only
    * `vocab` serializes; the maps rebuild per executor. */
  final class Model(val vocab: Array[String]) extends Serializable {
    @transient lazy val (starts, conts, maxStart, maxCont):
        (java.util.HashMap[String, String], java.util.HashMap[String, String],
         Int, Int) = {
      val s = new java.util.HashMap[String, String]()
      val c = new java.util.HashMap[String, String]()
      var ms = 0
      var mc = 0
      vocab.foreach { tok =>
        if (tok.startsWith("##")) {
          val raw = tok.substring(2)
          if (raw.nonEmpty) { c.put(raw, tok); mc = math.max(mc, raw.length) }
        } else if (tok.nonEmpty) {
          s.put(tok, tok); ms = math.max(ms, tok.length)
        }
      }
      (s, c, ms, mc)
    }
  }

  def segment(word: String, model: Model): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    val n = word.length
    while (pos < n) {
      val (table, maxL0) =
        if (pos == 0) (model.starts, model.maxStart)
        else (model.conts, model.maxCont)
      var l = math.min(n - pos, maxL0)
      var found: String = null
      while (l >= 1 && found == null) {
        found = table.get(word.substring(pos, pos + l))
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
