package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, GraftSqlBridge}

/** Native n-dimensional Hilbert index — Skilling's transpose algorithm
  * ("Programming the Hilbert curve", AIP Conf. Proc. 707, 2004, public
  * domain): per-level axis invert/exchange ("inverse undo"), Gray
  * encode, then bit-interleave of the transposed axes (axis 0 owns the
  * most-significant slot at each level). Real layout keys are 3–4 dims
  * (lang × source × time), where the 2-D [[HilbertIndex]] xy2d kernel
  * can't go; the curve property (bijection + every consecutive index
  * one grid step apart) is exhaustively asserted in ProfileSpec for
  * n = 2, 3, 4. NOTE: at n = 2 the Skilling orientation is a
  * reflection of the xy2d convention — both are Hilbert curves, but
  * the two kernels' keys are not interchangeable within one layout.
  *
  * Input is ONE `ARRAY<BIGINT>` child (`array(dims…)` — the
  * [[NearestCentroid]] single-child shape keeps the expression binary
  * across arities); rows whose array length ≠ `n` or contains a NULL
  * element yield NULL. Elements are masked to their low `bits`
  * ([[graft.operators.ZOrder.zValue]]'s rule). The HOF twin
  * ([[graft.operators.ZOrder.hilbertValueNHof]]) is the executable
  * specification, parity-enforced in ProfileSpec; the DuckDB oracle
  * unrolls the same stages as chained column CTEs. */
case class HilbertNIndex(child: Expression, n: Int, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "hilbert_n_native"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if n >= 1 && bits > 0 && n * bits <= 62 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT> input and 0 < n*bits <= 62, " +
        s"got ${child.dataType.sql}, n=$n, bits=$bits")
  }

  override def nullSafeEval(input: Any): Any = {
    val r = HilbertNIndex.compute(input.asInstanceOf[ArrayData], n, bits)
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { c =>
      val r = ctx.freshName("hd")
      s"""
         |long $r = graft.plans.HilbertNIndex$$.MODULE$$.compute($c, $n, $bits);
         |if ($r < 0) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         |""".stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object HilbertNIndex {

  /** The per-row kernel — also called from generated code. Returns −1
    * for a malformed row (length ≠ n or a NULL element): the index of
    * any valid row is < 2^62, so the sentinel is unambiguous. */
  def compute(arr: ArrayData, n: Int, bits: Int): Long = {
    if (arr.numElements() != n) return -1L
    val mask = (1L << bits) - 1
    val x = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return -1L
      x(i) = arr.getLong(i) & mask
      i += 1
    }
    // inverse undo (Skilling): per level q, invert axis 0 or exchange
    // low bits of axis i with axis 0
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) {
      if ((x(n - 1) & q) != 0) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    // interleave the transposed bits, level msb-first, axis 0 highest
    var d = 0L
    var k = bits - 1
    while (k >= 0) {
      i = 0
      while (i < n) {
        d = (d << 1) | ((x(i) >> k) & 1L)
        i += 1
      }
      k -= 1
    }
    d
  }

  /** Column accessor: BIGINT n-D Hilbert index of `dims` bucket columns. */
  def hilbertNNative(dims: Seq[Column], bits: Int): Column = {
    import org.apache.spark.sql.functions.array
    GraftSqlBridge.column(HilbertNIndex(
      GraftSqlBridge.expression(
        array(dims.map(_.cast("long")): _*)),
      dims.size, bits))
  }
}
