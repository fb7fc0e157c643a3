package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Random-hyperplane LSH bucket id for a float vector: bit p of the result
  * is the sign of dot(vec, plane_p).
  *
  * Engine-portable by construction, so LSH-bucketed similarity queries are
  * oracle-checkable end to end:
  *   - component j of plane p derives from md5: the first 8 hex chars of
  *     md5("plane|p|j") as a uint32 v, mapped to v / 2^32 * 2 - 1 in
  *     [-1, 1) — a DuckDB list comprehension reproduces it exactly;
  *   - each product vec[j] * component is an IEEE double (identical on both
  *     engines); the dot accumulates in double. Summation-order FP noise is
  *     ~1e-16 while |dot| is O(0.1), so a cross-engine sign flip is
  *     vanishingly unlikely (and only the sign feeds the bucket).
  *
  * The component matrix is computed once per expression instance and
  * reused across rows (it depends only on (p, j)).
  */
case class HyperplaneLsh(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (left.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }) && right.dataType == org.apache.spark.sql.types.IntegerType &&
      right.foldable
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "hyperplane_lsh expects (array<float>, int literal)")
  }

  @transient private lazy val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def planes(nPlanes: Int, dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((nPlanes, dim), { _ =>
      Array.tabulate(nPlanes, dim)((p, j) => HyperplaneLsh.component(p, j))
    })

  override def nullSafeEval(vecAny: Any, planesAny: Any): Any =
    kernel(vecAny.asInstanceOf[ArrayData], planesAny.asInstanceOf[Int])

  /** Whole per-row kernel behind one monomorphic entry point — generated
    * code calls it directly on the unboxed child values. */
  def kernel(vec: ArrayData, nPlanes: Int): Long = {
    val n = vec.numElements()
    val comp = planes(nPlanes, n)
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      var dot = 0.0
      var j = 0
      while (j < n) {
        dot += vec.getFloat(j).toDouble * comp(p)(j)
        j += 1
      }
      if (dot >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplaneLsh", this,
      classOf[HyperplaneLsh].getName)
    val ad = "org.apache.spark.sql.catalyst.util.ArrayData"
    nullSafeCodeGen(ctx, ev, (vec, np) =>
      s"${ev.value} = $ref.kernel(($ad) $vec, (int) $np);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HyperplaneLsh =
    copy(left = newLeft, right = newRight)
}

object HyperplaneLsh {

  /** Deterministic md5-derived plane component in [-1, 1): uint32 from the
    * first 8 hex chars of md5("plane|p|j"), scaled. */
  def component(p: Int, j: Int): Double = {
    val md = MessageDigest.getInstance("MD5")
    val d = md.digest(s"plane|$p|$j".getBytes("UTF-8"))
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    v.toDouble / 4294967296.0 * 2.0 - 1.0
  }
}
