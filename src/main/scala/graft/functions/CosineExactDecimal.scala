package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Decimal-exact cosine similarity as ONE native pass per pair — the
  * oracle-bitwise kernel ([[graft.operators.Similarity.cosineExact]])
  * without the interpreted higher-order-function tax.
  *
  * Numeric semantics are IDENTICAL to the HOF formulation
  * `aggregate(zip_with(a,b, (x,y) => (x*y)::decimal(38,20)), 0,
  * (acc,v) => (acc+v)::decimal(38,20))`:
  *   - each product is an IEEE double, converted to decimal exactly as
  *     Spark's `Cast(double, DecimalType(38,20))` does —
  *     `BigDecimal.valueOf(d)` (canonical string form) rescaled to 20
  *     HALF_UP — which is also how DuckDB's
  *     `CAST(x*y AS DECIMAL(38,20))` rounds;
  *   - each accumulate step reproduces Spark's decimal Add promotion:
  *     (38,20)+(38,20) wants precision 39, which is capped at 38 by
  *     dropping one scale digit, so every add HALF_UP-rounds the running
  *     sum to scale 19 (the trailing cast back to (38,20) is numerically a
  *     no-op). Same-scale adds are otherwise exact, so order-independence
  *     holds like the HOF chain;
  *   - the final value is `dot.toDouble / (sqrt(na) * sqrt(nb))`, 0.0 when
  *     either norm is zero.
  * A differential spec pins native == HOF bit-for-bit on real vectors.
  */
case class CosineExactDecimal(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def isFloatArray(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (isFloatArray(left) && isFloatArray(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "cosine_exact expects (array<float>, array<float>)")
  }

  private def dec(d: Double): JBigDecimal =
    JBigDecimal.valueOf(d).setScale(20, RoundingMode.HALF_UP)

  override def nullSafeEval(aAny: Any, bAny: Any): Any = {
    val a = aAny.asInstanceOf[ArrayData]
    val b = bAny.asInstanceOf[ArrayData]
    val n = a.numElements()
    // zip_with null-pads mismatched lengths and the decimal add then
    // null-propagates — mirror that as a null result
    if (b.numElements() != n) return null
    var dot = JBigDecimal.ZERO.setScale(20)
    var na = JBigDecimal.ZERO.setScale(20)
    var nb = JBigDecimal.ZERO.setScale(20)
    def accum(acc: JBigDecimal, v: JBigDecimal): JBigDecimal =
      acc.add(v).setScale(19, RoundingMode.HALF_UP) // Spark Add → (38,19)
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot = accum(dot, dec(x * y))
      na = accum(na, dec(x * x))
      nb = accum(nb, dec(y * y))
      i += 1
    }
    if (na.signum() == 0 || nb.signum() == 0) 0.0
    else dot.doubleValue() /
      (math.sqrt(na.doubleValue()) * math.sqrt(nb.doubleValue()))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
