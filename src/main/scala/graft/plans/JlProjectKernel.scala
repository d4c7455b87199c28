package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, GraftSqlBridge}

/** Native Johnson–Lindenstrauss ±1 projection — the m left-associated
  * sign-chains of [[graft.operators.RandomProjection]] in ONE small
  * expression node.
  *
  * The declarative form materialized m·(2d−1) expression nodes (8×64 ⇒
  * ~1,000) into a single projection: the per-invocation ANALYSIS +
  * optimizer + codegen cost of that tree dominated the query at every
  * scale factor (measured 1.1 s at 500 rows vs 1.25 s at 2,000 — wall
  * time was plan-size-bound, not data-bound; guide §7.3's
  * gigantic-expression-tree planning trap). This kernel keeps the plan
  * O(1) nodes and computes the identical left-associated fold per row.
  *
  * Bit-identical contract with the declarative chain (parity-asserted
  * in RandomProjectionSpec): signs are [[graft.operators.
  * RandomProjection.sign]] (md5 parity of "jl:j:i"); each y_j
  * accumulates ±element in ASCENDING i with the sign applied as an
  * IEEE negation (== the chain's unary minus); float elements widen to
  * double exactly before accumulation. A null element nulls every y_j
  * (the chain touches all elements); a vector shorter than `d` throws,
  * matching ANSI element_at. */
case class JlProjectExpr(child: Expression, d: Int, m: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jl_project"

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(child.dataType) && d >= 1 && m >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE> input and d, m >= 1")

  // def, not val: the child is unresolved at construction and
  // dataType only becomes readable after analysis
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    JlProjectExpr.compute(input.asInstanceOf[ArrayData], isFloat, d, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.JlProjectExpr$$.MODULE$$.compute($c, $isFloat, $d, $m)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JlProjectExpr {

  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def signs(d: Int, m: Int): Array[Array[Double]] =
    signCache.computeIfAbsent((d, m), _ =>
      Array.tabulate(m, d)((j, i) => graft.operators.RandomProjection.sign(j, i)))

  /** The per-row kernel — also called from generated code. */
  def compute(arr: ArrayData, isFloat: Boolean, d: Int, m: Int): ArrayData = {
    require(arr.numElements() >= d,
      s"jl_project needs $d elements, got ${arr.numElements()}")
    val s = signs(d, m)
    // a null element nulls every output dim (each chain reads all d)
    var i = 0
    while (i < d) {
      if (arr.isNullAt(i)) return new GenericArrayData(new Array[Any](m))
      i += 1
    }
    val x = new Array[Double](d)
    i = 0
    while (i < d) {
      x(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      val sj = s(j)
      var acc = if (sj(0) > 0) x(0) else -x(0)
      var k = 1
      while (k < d) { acc += (if (sj(k) > 0) x(k) else -x(k)); k += 1 }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }

  /** m-element projection array over a vector column. */
  def jlProject(vec: Column, d: Int, m: Int): Column =
    GraftSqlBridge.column(
      JlProjectExpr(GraftSqlBridge.expression(vec), d, m))
}
