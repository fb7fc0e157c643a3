package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}

/** Σ_t min(a[t], b[t]) over two string→long maps, keys missing from
  * either side contributing 0 — the weighted-Jaccard numerator evaluated
  * ON the candidate-pair row (graft.operators.Dedup.weightedMinhashPairs'
  * verify stage).
  *
  * One native pass replacing the interpreted
  * `aggregate(map_values(map_zip_with(a, b, least)), 0, +)` chain, whose
  * per-pair cost (an allocated intermediate map + a boxed lambda call per
  * key) dominated the verify over the honestly-millions candidate set.
  * Semantics are IDENTICAL: map_zip_with iterates the key UNION with
  * nulls for one-sided keys and the lambda maps those to 0, so the sum
  * equals the INTERSECTION sum computed here; tf maps are built by
  * map_from_entries over a (id, t)-grouped aggregate, so keys are unique
  * per map. A differential spec pins native == HOF on generated maps
  * (overlapping, disjoint, empty, and duplicate-free by construction).
  *
  * The scan iterates the smaller map and probes the larger by linear
  * UTF8String equality — per-doc tf maps are vocabulary-bounded small
  * (tens of entries), so the quadratic probe on primitive arrays beats
  * hashing's allocation cost at this size.
  */
case class MapMinSum(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def isTfMap(e: Expression) = e.dataType match {
      case MapType(StringType, LongType, _) => true
      case _ => false
    }
    if (isTfMap(left) && isTfMap(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        "map_min_sum expects (map<string,bigint>, map<string,bigint>)")
  }

  override def nullSafeEval(aAny: Any, bAny: Any): Any = {
    val ma = aAny.asInstanceOf[MapData]
    val mb = bAny.asInstanceOf[MapData]
    val (s, l) =
      if (ma.numElements() <= mb.numElements()) (ma, mb) else (mb, ma)
    val sk = s.keyArray(); val sv = s.valueArray()
    val lk = l.keyArray(); val lv = l.valueArray()
    val ns = s.numElements(); val nl = l.numElements()
    var sum = 0L
    var i = 0
    while (i < ns) {
      val k = sk.getUTF8String(i)
      var j = 0
      var done = false
      while (j < nl && !done) {
        if (lk.getUTF8String(j).equals(k)) {
          sum += math.min(sv.getLong(i), lv.getLong(j))
          done = true // keys are unique within a map (map_from_entries
                      // over a grouped aggregate)
        }
        j += 1
      }
      i += 1
    }
    sum
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
