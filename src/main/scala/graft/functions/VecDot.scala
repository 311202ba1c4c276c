package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two float-array columns.
  *
  * The composed form — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — is
  * semantically identical but runs as interpreted CodegenFallback
  * expressions (higher-order functions don't participate in whole-stage
  * codegen), which measurably dominates vector-heavy plans. This
  * BinaryExpression generates a tight primitive loop instead, keeping
  * the whole stage codegen-fused — the (b)-tier of SURVEY §2.11's
  * extension ladder, justified because built-ins can't express a fused
  * float dot product.
  *
  * Fold order matches the composed form (ascending index, double
  * accumulation), so results are bit-identical — the DuckDB oracle twins
  * are unaffected. Unequal lengths use the shorter prefix; a null
  * ELEMENT in either array yields a null result (SQL-style propagation
  * — reading it as 0.0 would silently corrupt the dot product).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // ExpectsInputTypes is not implementable outside the sql package
  // (AbstractDataType is private[sql]); validate types directly.
  override def checkInputDataTypes(): TypeCheckResult = {
    def isFloatArray(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires two array<float> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vec_dot"

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $s += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}
