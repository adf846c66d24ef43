package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Shared input validation for the fused-loop vector kernels: both
  * children must be arrays of float/double/int/long. Failing here (at
  * analysis time, via [[Expression.checkInputDataTypes]]) turns a
  * mistyped column — e.g. array&lt;string&gt; or array&lt;decimal&gt; —
  * into a clean AnalysisException instead of a raw
  * IllegalArgumentException thrown mid-execution from eval/codegen. */
private[functions] trait NumericArrayPairChecks { self: BinaryExpression =>

  private def numericArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = Seq(left, right).map(_.dataType).filterNot(numericArray)
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two arrays of float/double/int/long, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
}

/** Native codegen'd cosine similarity over two numeric array columns -
  * the scoring kernel of the whole ANN family (brute force, IVF,
  * kNN join, SemDeDup, semantic contamination, streaming retrieval).
  *
  * The higher-order-function formulation
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)` three times: dot + both
  * norms) is CodegenFallback - interpreted per row, one lambda
  * invocation and one boxed accumulator per ELEMENT, and it
  * re-walks each array three times. This is one fused loop inside
  * whole-stage codegen.
  *
  * Bit-compatibility contract (the DuckDB oracles compare hashes of
  * these doubles): each input element upcasts to double BEFORE
  * multiplying, and all three accumulations fold in ascending index
  * order - exactly the HOF's left fold - so results are IEEE-identical
  * to the formulation they replace. Zero denominator returns 0.0 (the
  * [[graft.llm.Ann.cosine]] convention); a null array, a null element,
  * or a length mismatch returns null (what zip_with's null padding
  * and aggregate's null propagation produced).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with NumericArrayPairChecks {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemTag(e: Expression): Char = e.dataType match {
    case ArrayType(FloatType, _) => 'f'
    case ArrayType(DoubleType, _) => 'd'
    case ArrayType(IntegerType, _) => 'i'
    case ArrayType(LongType, _) => 'l'
    case other => throw new IllegalArgumentException(
      s"cosine_sim expects a numeric array, got $other")
  }
  private lazy val tagL: Char = elemTag(left)
  private lazy val tagR: Char = elemTag(right)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      tagL, tagR)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r = graft.functions.CosineSim.compute(
         |  $a, $b, '$tagL', '$tagR');
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}

/** Native fused-loop dot product - same contract as [[CosineSim]]
  * (double upcast per element, ascending-index fold, empty arrays
  * dot to 0.0, null element / length mismatch returns null - the
  * exact aggregate(zip_with(_*_)) semantics it replaces). Works both
  * as a plain projection kernel and INSIDE higher-order lambdas
  * (centroid-list transforms), where it replaces a nested interpreted
  * aggregate loop per element. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with NumericArrayPairChecks {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemTag(e: Expression): Char = e.dataType match {
    case ArrayType(FloatType, _) => 'f'
    case ArrayType(DoubleType, _) => 'd'
    case ArrayType(IntegerType, _) => 'i'
    case ArrayType(LongType, _) => 'l'
    case other => throw new IllegalArgumentException(
      s"dot_product expects a numeric array, got $other")
  }
  private lazy val tagL: Char = elemTag(left)
  private lazy val tagR: Char = elemTag(right)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      tagL, tagR)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r = graft.functions.DotProduct.compute(
         |  $a, $b, '$tagL', '$tagR');
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

object DotProduct {
  def compute(a: ArrayData, b: ArrayData, tagA: Char,
              tagB: Char): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      dot += CosineSim.get(a, i, tagA) * CosineSim.get(b, i, tagB)
      i += 1
    }
    java.lang.Double.valueOf(dot)
  }
}

object CosineSim {

  private[functions] def get(a: ArrayData, i: Int, tag: Char): Double = (tag: @annotation.switch) match {
    case 'f' => a.getFloat(i).toDouble
    case 'd' => a.getDouble(i)
    case 'i' => a.getInt(i).toDouble
    case _ => a.getLong(i).toDouble
  }

  /** null (boxed) on length mismatch or any null element - matching
    * the zip_with/aggregate null semantics this replaces. */
  def compute(a: ArrayData, b: ArrayData, tagA: Char,
              tagB: Char): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0
    var na2 = 0.0
    var nb2 = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = get(a, i, tagA)
      val y = get(b, i, tagB)
      dot += x * y
      na2 += x * x
      nb2 += y * y
      i += 1
    }
    val d = math.sqrt(na2) * math.sqrt(nb2)
    if (d == 0.0) java.lang.Double.valueOf(0.0)
    else java.lang.Double.valueOf(dot / d)
  }
}
