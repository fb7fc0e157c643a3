package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Map-side IVF cell assignment: the `probes` nearest centroids of a float
  * vector, computed per row against a FOLDABLE centroid array — no join, no
  * window, no shuffle. This replaces the corpus×k join +
  * `row_number() over (partition by vec_id)` pattern, whose window forced a
  * full shuffle of corpus×k rows just to pick each vector's argmax cell —
  * at 100 TB the single biggest avoidable shuffle in the ANN suite.
  * Assignment is now a projection; the corpus flows straight from the scan
  * into the cell equi-join.
  *
  * Children: (vec: array<float>, centroids: foldable
  * array<struct<id:long, vec:array<float>>>, probes: int literal,
  * exact: boolean literal). Returns the chosen cell ids as array<long>,
  * best first.
  *
  * Ranking semantics are IDENTICAL to the join+window formulation they
  * replace (pinned by a differential spec):
  *   - fast phase: [[CosineSimilarity]]'s double kernel against every
  *     centroid, ranked (sim desc, cell_id asc);
  *   - exact mode: the top `probes + 1` fast candidates are re-scored with
  *     [[CosineExactDecimal]]'s decimal-accumulated kernel, rounded to 9
  *     places exactly as Spark's `round(_, 9)` does, and re-ranked
  *     (rounded desc, cell_id asc) — the fast kernel's error vs the decimal
  *     kernel is <1e-11, so the true top-`probes` always survive the
  *     +1-margin prefilter. A length-mismatched centroid scores null
  *     (mirroring `zip_with` null-pad) and ranks last, as a descending
  *     null-last sort did.
  *
  * The centroid array is evaluated once per expression instance
  * (constant-folded literal), unpacked to primitive arrays, and centroid
  * norms are precomputed — per row the work is one k×dim fused
  * multiply-accumulate, the same arithmetic the join formulation paid, minus
  * the shuffle.
  */
case class NearestCells(vec: Expression, centroids: Expression,
                        probes: Expression, exact: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(vec, centroids, probes, exact)
  override def nullable: Boolean = vec.nullable
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    def isFloatArray(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val centOk = centroids.foldable && (centroids.dataType match {
      case ArrayType(st: StructType, _) if st.fields.length == 2 =>
        st.fields(0).dataType == LongType && isFloatArray(st.fields(1).dataType)
      case _ => false
    })
    if (isFloatArray(vec.dataType) && centOk &&
        probes.foldable && probes.dataType == IntegerType &&
        exact.foldable && exact.dataType == BooleanType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "nearest_cells expects (array<float>, foldable array<struct<long, " +
        "array<float>>>, int literal, boolean literal)")
  }

  @transient private lazy val probesVal: Int =
    probes.eval(null).asInstanceOf[Int]
  @transient private lazy val exactVal: Boolean =
    exact.eval(null).asInstanceOf[Boolean]

  // id-ascending order makes a stable (sim desc) sort break ties id-asc
  @transient private lazy val (cellIds, cellVecs, cellNorms) = {
    val arr = centroids.eval(null).asInstanceOf[ArrayData]
    val cells = Array.tabulate(arr.numElements()) { i =>
      val row = arr.getStruct(i, 2)
      (row.getLong(0), row.getArray(1).toFloatArray())
    }.sortBy(_._1)
    val norms = cells.map { case (_, v) =>
      var s = 0.0; var j = 0
      while (j < v.length) { val d = v(j).toDouble; s += d * d; j += 1 }
      s
    }
    (cells.map(_._1), cells.map(_._2), norms)
  }

  /** [[CosineSimilarity]]'s kernel verbatim (double promote, fused
    * accumulate, min-length, zero-norm → 0.0) so the fast ranking is
    * bit-identical to the join it replaces. */
  private def fastCosine(x: ArrayData, cell: Int): Double = {
    val c = cellVecs(cell)
    val n = math.min(x.numElements(), c.length)
    var dot = 0.0; var nx = 0.0; var j = 0
    while (j < n) {
      val xv = x.getFloat(j).toDouble
      val yv = c(j).toDouble
      dot += xv * yv; nx += xv * xv; j += 1
    }
    val ny = if (n == c.length) cellNorms(cell) else {
      var s = 0.0; var j2 = 0
      while (j2 < n) { val d = c(j2).toDouble; s += d * d; j2 += 1 }
      s
    }
    if (nx == 0.0 || ny == 0.0) 0.0
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  /** [[CosineExactDecimal]]'s kernel verbatim against a primitive centroid;
    * null on length mismatch (zip_with null-pad). */
  private def exactCosine(x: ArrayData, c: Array[Float]): java.lang.Double = {
    val n = x.numElements()
    if (c.length != n) return null
    def dec(d: Double): JBigDecimal =
      JBigDecimal.valueOf(d).setScale(20, RoundingMode.HALF_UP)
    def accum(acc: JBigDecimal, v: JBigDecimal): JBigDecimal =
      acc.add(v).setScale(19, RoundingMode.HALF_UP)
    var dot = JBigDecimal.ZERO.setScale(20)
    var na = JBigDecimal.ZERO.setScale(20)
    var nb = JBigDecimal.ZERO.setScale(20)
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = c(i).toDouble
      dot = accum(dot, dec(xv * yv))
      na = accum(na, dec(xv * xv))
      nb = accum(nb, dec(yv * yv))
      i += 1
    }
    if (na.signum() == 0 || nb.signum() == 0) 0.0
    else dot.doubleValue() /
      (math.sqrt(na.doubleValue()) * math.sqrt(nb.doubleValue()))
  }

  /** Spark's `round(double, 9)`: canonical-string BigDecimal, HALF_UP. */
  private def round9(d: Double): Double =
    JBigDecimal.valueOf(d).setScale(9, RoundingMode.HALF_UP).doubleValue()

  override def eval(input: InternalRow): Any = {
    val vAny = vec.eval(input)
    if (vAny == null) null else kernel(vAny.asInstanceOf[ArrayData])
  }

  /** The whole per-row kernel behind one monomorphic entry point, so
    * generated code calls it directly on the unboxed child ArrayData —
    * the projection stays inside WholeStageCodegen with no
    * CodegenFallback row materialization on the ANN suite's hottest
    * expression. */
  def kernel(x: ArrayData): ArrayData = {
    val m = cellIds.length
    // probes=1 fast path (IVF/PQ assignment, the by-far hottest shape):
    // plain argmax scan — no score array, no boxed tuple sort. cellIds is
    // ascending, so keeping the FIRST max ties id-asc exactly like the
    // general (sim desc, cell_id asc) sort.
    if (probesVal == 1 && !exactVal) {
      var best = 0; var bestSim = fastCosine(x, 0); var i = 1
      while (i < m) {
        val s = fastCosine(x, i)
        if (s > bestSim) { best = i; bestSim = s }
        i += 1
      }
      return new GenericArrayData(Array(cellIds(best)))
    }
    val sims = new Array[Double](m)
    var i = 0
    while (i < m) { sims(i) = fastCosine(x, i); i += 1 }
    val p = math.min(probesVal, m)
    val order = Array.range(0, m).sortBy(j => (-sims(j), cellIds(j)))
    val chosen: Array[Int] =
      if (!exactVal) order.take(p)
      else {
        val cand = order.take(math.min(probesVal + 1, m))
        // The decimal re-rank can only reorder candidates whose fast sims
        // sit within the kernel's error window: with |fast - exact| < 1e-11
        // and round-9 monotone (round9(a) > round9(b) whenever a-b > 1e-9),
        // an adjacent fast gap > 1e-8 makes the decimal order provably
        // identical — so the expensive BigDecimal pass runs only on the
        // rare near-tie rows (duplicate vectors, quantized corpora).
        val needExact = (0 until cand.length - 1).exists { r =>
          sims(cand(r)) - sims(cand(r + 1)) <= 1e-8
        } || cand.exists(j => cellVecs(j).length != x.numElements())
        if (!needExact) cand.take(p)
        else cand
          .map { j =>
            val e = exactCosine(x, cellVecs(j))
            (j, if (e == null) Double.NegativeInfinity else round9(e))
          }
          .sortBy { case (j, r) => (-r, cellIds(j)) }
          .take(p).map(_._1)
      }
    new GenericArrayData(chosen.map(cellIds))
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    // Evaluate only the vec child in-line (centroids/probes/exact are
    // foldable and live in the instance's lazy state); hand the raw
    // ArrayData to the kernel via a reference object.
    val ref = ctx.addReferenceObj("nearestCells", this,
      classOf[NearestCells].getName)
    val vecGen = vec.genCode(ctx)
    val ad = "org.apache.spark.sql.catalyst.util.ArrayData"
    ev.copy(code =
      code"""
        ${vecGen.code}
        boolean ${ev.isNull} = ${vecGen.isNull};
        $ad ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = $ref.kernel(($ad) ${vecGen.value});
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NearestCells =
    copy(vec = newChildren(0), centroids = newChildren(1),
      probes = newChildren(2), exact = newChildren(3))
}
