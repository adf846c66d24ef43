package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native unigram-LM (SentencePiece-class) segmentation: Viterbi
  * best-path of a word under a vocabulary of (piece, integer cost)
  * entries - the apply step for a shipped unigram `.model`-style
  * artifact (Llama/T5/Gemma tokenizer family), completing the engine's
  * tokenizer set next to word-BPE, byte-BPE, and WordPiece.
  *
  * Semantics (shared bit-for-bit with the DuckDB recursive-CTE
  * oracle):
  *   - minimize the SUM of piece costs over a segmentation (costs are
  *     integer-quantized negative log-probs, so this is the unigram-LM
  *     maximum-likelihood path with no floating point in the DP);
  *   - any single code point absent from the vocabulary is always
  *     available as a fallback piece at `unkCost` (total coverage, the
  *     published unigram <unk> path) and counts toward `n_unk`;
  *   - equal totals break toward the LONGER piece at each position
  *     (deterministic: at most one piece of each length ends at a
  *     position);
  *   - words over [[UnigramSegment.MaxWordLen]] code points collapse
  *     to a single `[UNK]` without paying the DP (the
  *     max_input_chars_per_word-style circuit breaker).
  *
  * Iteration is by Unicode code point throughout (piece lengths, the
  * cap, substring probes), matching DuckDB `length`/`substr`. The
  * vocabulary is plan-time model state shared per executor (the
  * [[BpeSegment]] pattern; only the entry list serializes, the hash
  * table rebuilds per executor behind one @transient lazy field).
  * Returns STRUCT(pieces ARRAY<STRING>, n_unk INT); participates in
  * whole-stage codegen via `defineCodeGen`. */
case class UnigramSegment(child: Expression, vocab: Seq[(String, Long)],
                          unkCost: Long)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("pieces", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("n_unk", IntegerType, nullable = false)))

  @transient private lazy val model =
    new UnigramSegment.Model(vocab.map(_._1).toArray,
      vocab.map(_._2).toArray, unkCost)

  override protected def nullSafeEval(input: Any): Any =
    UnigramSegment.segmentData(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("ugModel", model,
      classOf[UnigramSegment.Model].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnigramSegment.segmentData($c, $modelRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "unigram_segment"
}

object UnigramSegment {

  val Unk = "[UNK]"

  /** Word-length circuit breaker in code points: longer words become a
    * single [UNK], bounding DP cost against pathological inputs. */
  val MaxWordLen = 48

  /** Cost table built once per executor: piece -> cost plus the max
    * piece length IN CODE POINTS to bound the inner DP loop. */
  private[functions] final class Table(pieces: Array[String],
                                       costs: Array[Long]) {
    val byPiece = new java.util.HashMap[String, java.lang.Long]()
    var maxLen = 1
    var i = 0
    while (i < pieces.length) {
      val p = pieces(i)
      if (p.nonEmpty) {
        byPiece.put(p, costs(i))
        maxLen = math.max(maxLen, p.codePointCount(0, p.length))
      }
      i += 1
    }
  }

  /** Executor-shared model. Only the entry arrays serialize; the hash
    * table rebuilds per executor behind a single @transient lazy field
    * (a tuple-pattern lazy val would leave the synthesized backing
    * field non-transient). */
  final class Model(val pieces: Array[String], val costs: Array[Long],
                    val unkCost: Long) extends Serializable {
    @transient lazy val table: Table = new Table(pieces, costs)
  }

  /** Viterbi best segmentation: (pieces, n_unk). */
  def segment(word: String, model: Model): (Array[String], Int) = {
    val t = model.table
    val cps = word.codePoints().toArray
    val n = cps.length
    if (n == 0) return (Array.empty[String], 0)
    if (n > MaxWordLen) return (Array(Unk), 1)
    val best = new Array[Long](n + 1)
    val bl = new Array[Int](n + 1) // winning piece length ending at j
    val bUnk = new Array[Boolean](n + 1) // winning piece is a fallback
    var j = 1
    while (j <= n) {
      best(j) = Long.MaxValue
      // l descending + strict improvement == tie breaks to longer piece
      var l = math.min(j, t.maxLen)
      while (l >= 1) {
        val sub = new String(cps, j - l, l)
        val c = t.byPiece.get(sub)
        if (c != null) {
          val tot = best(j - l) + c.longValue()
          if (tot < best(j)) { best(j) = tot; bl(j) = l; bUnk(j) = false }
        } else if (l == 1) {
          val tot = best(j - 1) + model.unkCost
          if (tot < best(j)) { best(j) = tot; bl(j) = 1; bUnk(j) = true }
        }
        l -= 1
      }
      j += 1
    }
    // backtrack
    var k = n
    var count = 0
    while (k > 0) { count += 1; k -= bl(k) }
    val out = new Array[String](count)
    var unk = 0
    k = n
    var idx = count - 1
    while (k > 0) {
      val l = bl(k)
      out(idx) = new String(cps, k - l, l)
      if (bUnk(k)) unk += 1
      idx -= 1
      k -= l
    }
    (out, unk)
  }

  def segmentData(word: UTF8String, model: Model): InternalRow = {
    val (toks, unk) = segment(word.toString, model)
    val arr = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { arr(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericInternalRow(Array[Any](new GenericArrayData(arr), unk))
  }
}
