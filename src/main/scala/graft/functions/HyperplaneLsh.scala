package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Random-hyperplane LSH bucket id for a float vector, as one codegen'd
  * pass: bit p of the result is the sign of dot(vec, plane_p), where
  * component j of plane_p is a deterministic pseudo-random value in [-1, 1)
  * derived from splitmix64(p, j). No stored model, reproducible everywhere.
  *
  * This is the map-side half of the scale path for similarity search /
  * embedding near-dup: bucket ids shuffle as single longs; vectors only
  * meet inside equal buckets.
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

  override def nullSafeEval(vecAny: Any, planesAny: Any): Any = {
    val vec = vecAny.asInstanceOf[ArrayData]
    val planes = planesAny.asInstanceOf[Int]
    HyperplaneLsh.bucketOf(vec, planes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, planes) => {
      s"${ev.value} = graft.functions.HyperplaneLsh.bucketOf($vec, $planes);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HyperplaneLsh =
    copy(left = newLeft, right = newRight)
}

object HyperplaneLsh {

  /** splitmix64 finalizer — the plane-component PRNG. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic plane component in [-1, 1). */
  def component(p: Int, j: Int): Double = {
    val h = mix(p.toLong * 0x100000001b3L + j)
    (h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
  }

  /** Sign-bit bucket over `planes` hyperplanes (called from codegen). */
  def bucketOf(vec: ArrayData, planes: Int): Long = {
    val n = vec.numElements()
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var j = 0
      while (j < n) {
        dot += vec.getFloat(j).toDouble * component(p, j)
        j += 1
      }
      if (dot >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }
}
