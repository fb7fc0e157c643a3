package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Asymmetric-distance cosine for product-quantized ANN
  * ([[graft.operators.Similarity.pqTopK]]): given a corpus row's PQ codes
  * and a query's per-subspace dot-product lookup tables,
  *
  *   cos(q, recon(codes)) = Σ_j lut_j[code_j]
  *                          / (qnorm · sqrt(Σ_j nsq_j[code_j]))
  *
  * where nsq_j[c] = |codebook_j[c]|² is a FOLDABLE model table unpacked
  * once per expression instance. One native pass per (corpus row, query):
  * the HOF formulation of the same sum (aggregate over zip_with) is kept
  * in a differential spec, but after projection collapse it re-evaluates
  * the code-assignment children once per subspace element — quadratic in
  * m on the hottest scan of the PQ suite. This expression evaluates each
  * child exactly once and stays inside WholeStageCodegen.
  *
  * Children: (codes: array<long>, luts: array<array<double>>,
  * qnorm: double, nsq: foldable array<array<double>>). A code outside its
  * table's range contributes nothing (defensive: model/codes mismatch).
  * Zero qnorm or zero reconstructed norm yields 0.0, matching
  * [[CosineSimilarity]]'s zero-vector convention.
  */
case class AdcCosine(codes: Expression, luts: Expression,
                     qnorm: Expression, nsq: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(codes, luts, qnorm, nsq)
  override def nullable: Boolean =
    codes.nullable || luts.nullable || qnorm.nullable
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def isDoubleTable(dt: DataType) = dt match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    val codesOk = codes.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (codesOk && isDoubleTable(luts.dataType) &&
        qnorm.dataType == DoubleType &&
        nsq.foldable && isDoubleTable(nsq.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "pq_adc expects (array<long>, array<array<double>>, double, " +
        "foldable array<array<double>>)")
  }

  @transient private lazy val nsqTab: Array[Array[Double]] = {
    val arr = nsq.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements())(j => arr.getArray(j).toDoubleArray())
  }

  /** Whole per-row kernel behind one monomorphic entry point (the
    * [[NearestCells]] codegen pattern): generated code hands the unboxed
    * child values straight in. */
  def kernel(cd: ArrayData, lt: ArrayData, qn: Double): Double = {
    val m = math.min(cd.numElements(),
      math.min(lt.numElements(), nsqTab.length))
    var dot = 0.0; var rn = 0.0; var j = 0
    while (j < m) {
      val c = cd.getLong(j).toInt
      val lut = lt.getArray(j)
      if (c >= 0 && c < lut.numElements()) dot += lut.getDouble(c)
      val ns = nsqTab(j)
      if (c >= 0 && c < ns.length) rn += ns(c)
      j += 1
    }
    if (qn == 0.0 || rn == 0.0) 0.0 else dot / (qn * math.sqrt(rn))
  }

  override def eval(input: InternalRow): Any = {
    val cd = codes.eval(input)
    if (cd == null) return null
    val lt = luts.eval(input)
    if (lt == null) return null
    val qn = qnorm.eval(input)
    if (qn == null) return null
    kernel(cd.asInstanceOf[ArrayData], lt.asInstanceOf[ArrayData],
      qn.asInstanceOf[java.lang.Double])
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adcCosine", this,
      classOf[AdcCosine].getName)
    val cdGen = codes.genCode(ctx)
    val ltGen = luts.genCode(ctx)
    val qnGen = qnorm.genCode(ctx)
    val ad = "org.apache.spark.sql.catalyst.util.ArrayData"
    ev.copy(code =
      code"""
        ${cdGen.code}
        ${ltGen.code}
        ${qnGen.code}
        boolean ${ev.isNull} =
          ${cdGen.isNull} || ${ltGen.isNull} || ${qnGen.isNull};
        double ${ev.value} = 0.0;
        if (!${ev.isNull}) {
          ${ev.value} = $ref.kernel(($ad) ${cdGen.value},
            ($ad) ${ltGen.value}, ${qnGen.value});
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AdcCosine =
    copy(codes = newChildren(0), luts = newChildren(1),
      qnorm = newChildren(2), nsq = newChildren(3))
}
