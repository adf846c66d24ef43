package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the X4 Greek-symbol transliteration
  * (AgrTsvLoader.parseSymbol, AgrTsvLoader.java:437-486): one pass over
  * the string instead of 15 chained regexp_replace passes. Participates
  * in whole-stage codegen via `defineCodeGen` (the generated code calls
  * the static `translit`, so there is no interpreted fallback fence).
  *
  * Semantics matched to the reference exactly, including the eta(951) ->
  * "lambda" quirk and dropping any other codepoint > 127 (which the
  * reference logs and skips).
  */
case class GreekTransliterate(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      GreekTransliterate.translit(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.GreekTransliterate.translit($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "greek_translit"
}

object GreekTransliterate {

  /** The 15-codepoint map + drop-other-non-ASCII rule; a fast pure
    * function invoked from both interpreted eval and generated code. */
  def translit(s: String): String = {
    var i = 0
    var ascii = true
    while (i < s.length && ascii) { if (s.charAt(i) > 127) ascii = false; i += 1 }
    if (ascii) return s // reference short-circuits pure-ASCII strings

    val out = new java.lang.StringBuilder(s.length + 16)
    i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      (c: Int) match {
        case 916 => out.append("DELTA")
        case 945 => out.append("alpha")
        case 946 => out.append("beta")
        case 947 => out.append("gamma")
        case 948 => out.append("delta")
        case 949 => out.append("epsilon")
        case 950 => out.append("zeta")
        case 951 => out.append("lambda") // sic - reference maps eta to lambda
        case 952 => out.append("theta")
        case 953 => out.append("iota")
        case 954 => out.append("kappa")
        case 955 => out.append("lambda")
        case 956 => out.append("mu")
        case 963 => out.append("sigma")
        case cp if cp > 127 => () // reference logs + skips
        case _ => out.append(c)
      }
      i += 1
    }
    out.toString
  }
}

/** Session extensions: registers the engine's native functions so SQL
  * users get them too (`SELECT greek_translit(sym) FROM ...`). Install
  * with `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("greek_translit"),
      new ExpressionInfo(classOf[GreekTransliterate].getName, "greek_translit"),
      (exprs: Seq[Expression]) => GreekTransliterate(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => {
        val k = exprs.lift(1).map(_.eval(null) match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"minhash_sig k must be an integer literal, got $other")
        }).getOrElse(64)
        MinHashSig(exprs.head, k)
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("simhash_text"),
      new ExpressionInfo(classOf[SimHashText].getName, "simhash_text"),
      (exprs: Seq[Expression]) => SimHashText(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("shingle_array"),
      new ExpressionInfo(classOf[ShingleArray].getName, "shingle_array"),
      (exprs: Seq[Expression]) => {
        val n = exprs.lift(1).map(_.eval(null) match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"shingle_array n must be an integer literal, got $other")
        }).getOrElse(3)
        ShingleArray(exprs.head, n)
      }))
    ext.injectFunction((
      new FunctionIdentifier("md5_minhash_sig"),
      new ExpressionInfo(classOf[Md5MinHashSig].getName, "md5_minhash_sig"),
      (exprs: Seq[Expression]) => {
        val k = exprs.lift(1).map(_.eval(null) match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"md5_minhash_sig k must be an integer literal, got $other")
        }).getOrElse(16)
        Md5MinHashSig(exprs.head, k)
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_text_sig"),
      new ExpressionInfo(classOf[MinHashTextSig].getName, "minhash_text_sig"),
      (exprs: Seq[Expression]) => {
        def intLit(e: Expression, name: String): Int = e.eval(null) match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"minhash_text_sig $name must be an integer literal, got $other")
        }
        val n = exprs.lift(1).map(intLit(_, "n")).getOrElse(3)
        val k = exprs.lift(2).map(intLit(_, "k")).getOrElse(64)
        MinHashTextSig(exprs.head, n, k)
      }))
  }
}
