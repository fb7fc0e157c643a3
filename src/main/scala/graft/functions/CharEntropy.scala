package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon character entropy of a string in bits per character — the
  * cheap compressibility proxy web-corpus cleaning uses to catch
  * degenerate text (repeated characters/loops score near 0, natural
  * English sits around 4.1–4.5 bits/char; Shannon 1948, Gopher-class
  * "symbol diversity" rules): ONE pass builds the code-point histogram,
  * then H = Σ (c/n)·log2(n/c) over the distinct code points.
  *
  * Engine-exact by construction: each term is round(·, 9) (decimal
  * HALF_UP on the double's value — what Spark's and DuckDB's round both
  * do) and accumulated in exact units of 1e-9 — exact addition, so the
  * sum is ORDER-INDEPENDENT and any SQL engine replays it from a
  * per-character GROUP BY with the same rounding (see the q318 oracle);
  * the caller applies the published round(·, 6) through the engine's
  * own round. An empty string scores 0.0. Code points, not bytes, so
  * the oracle's char-split replay matches on any text, not only
  * ASCII. */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure("char_entropy expects (string)")

  override def nullSafeEval(v: Any): Any =
    kernel(v.asInstanceOf[UTF8String])

  /** Whole per-row kernel behind one monomorphic entry point. */
  def kernel(s: UTF8String): Double = {
    val str = s.toString
    if (str.isEmpty) return 0.0
    val counts = new java.util.HashMap[Integer, Array[Long]]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val slot = counts.computeIfAbsent(cp, _ => new Array[Long](1))
      slot(0) += 1
      n += 1
      i += Character.charCount(cp)
    }
    // Σ round((c/n)·log2(n/c), 9) as exact decimal ninths: rounded terms
    // sum in units of 1e-9 as longs (|terms| <= n <= 2^31 keeps the
    // accumulator far from overflow), so the result is order-independent
    // and bit-identical to the oracle's DECIMAL(19,9) accumulation
    var acc = 0L
    val it = counts.values().iterator()
    val nD = n.toDouble
    while (it.hasNext) {
      val c = it.next()(0).toDouble
      val term = (c / nD) * (Math.log(nD / c) / Math.log(2.0))
      // decimal-exact HALF_UP at 9 places on the double's value — the
      // same rounding Spark's round() applies, unlike
      // Math.round(term * 1e9), whose multiply re-rounds first. DuckDB's
      // round() multiplies by 10^9 BEFORE rounding, so a term within
      // ~1 ulp of a .5e-9 boundary could in principle round apart from
      // this kernel even on bit-identical doubles; the caller's outer
      // round(·, 6) absorbs that residual 1e-9 disagreement
      acc += new java.math.BigDecimal(term)
        .setScale(9, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
    }
    // the 9-decimal-pinned sum itself; the caller applies the published
    // round(·, 6) through the engine's own round (house style — the
    // same final-rounding discipline every DECIMAL-pinned query uses)
    acc / 1e9
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charEntropy", this,
      classOf[CharEntropy].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.kernel($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}
