package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, GraftSqlBridge}

/** Native codegen'd 2-D Hilbert index (the classic xy2d bit-level
  * transform). The higher-order-function formulation
  * ([[graft.operators.ZOrder.hilbertValueHof]]) folds a struct state
  * through `bits` interpreted lambda dispatches per row — measured
  * 45 s for a 15M-row single-task layout pass at sf10; this expression
  * generates the tight primitive loop instead, bit-identical semantics
  * (same level order, same full-(n−1) reflection convention, parity-
  * enforced in ProfileSpec). The §7.3 "custom Expression" escalation:
  * a per-row integer kernel the built-in operators can only express
  * interpreted. Inputs are masked to their low `bits` (the
  * [[graft.operators.ZOrder.zValue]] rule). */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hilbert_native"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType == LongType
    if (ok(left) && ok(right) && bits > 0 && 2 * bits <= 62)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BIGINT inputs and 0 < 2*bits <= 62, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}, bits=$bits")
  }

  private def mask: Long = (1L << bits) - 1

  override def nullSafeEval(l: Any, r: Any): Any = {
    var x = l.asInstanceOf[Long] & mask
    var y = r.asInstanceOf[Long] & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = mask - x; y = mask - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val s = ctx.freshName("s"); val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry"); val t = ctx.freshName("t")
      val d = ctx.freshName("d")
      s"""
         |long $x = $l & ${mask}L;
         |long $y = $r & ${mask}L;
         |long $d = 0L;
         |for (long $s = ${1L << (bits - 1)}L; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0) {
         |    if ($rx == 1) { $x = ${mask}L - $x; $y = ${mask}L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  /** Column-API accessor: BIGINT Hilbert index of two bucket columns. */
  def hilbertNative(x: Column, y: Column, bits: Int): Column =
    GraftSqlBridge.column(HilbertIndex(
      GraftSqlBridge.expression(x.cast("long")),
      GraftSqlBridge.expression(y.cast("long")), bits))
}
