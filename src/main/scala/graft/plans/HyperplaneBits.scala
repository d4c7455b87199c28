package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, GraftSqlBridge}

/** Native hyperplane-LSH signature: all `nPlanes` Rademacher projections
  * of one vector in a single tight JVM pass.
  *
  * The higher-order formulation ([[graft.operators.Dedup.hyperplaneBitsHof]])
  * pays an interpreted lambda dispatch per (plane × element) — nPlanes×dim
  * ≈ 1024 dispatches per row, measured 6.3 s for 500 rows at sf0.01 (the
  * per-query budget gate caught it). This kernel is the
  * [[FeatureHashEmbed]] escalation: one compiled loop, same bit contract.
  *
  * Bit contract (replayed verbatim by the DuckDB oracle): plane p's
  * component i (1-based) is +1 iff the first hex digit of
  * md5("plane:p:i") ≤ '7'; bit p = 1 iff Σᵢ (xᵢ − center)·±1 ≥ 0 with
  * left-to-right double accumulation. The ±1 matrix is a pure function of
  * (nPlanes, dim), so the kernel derives and caches it — nothing but the
  * two scalars rides in the expression.
  */
case class HyperplaneBits(child: Expression, nPlanes: Int, center: Double)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_bits"

  // can return NULL regardless of input nullability (null array elements) —
  // the L2Distance lesson: without this, a non-nullable child would emit an
  // assignment to a FalseLiteral isNull in codegen
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if nPlanes > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<DOUBLE> input and nPlanes > 0")
  }

  override def nullSafeEval(input: Any): Any =
    HyperplaneBits.compute(input.asInstanceOf[ArrayData], nPlanes, center)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { c =>
      val r = ctx.freshName("bits")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.plans.HyperplaneBits$$.MODULE$$.compute($c, $nPlanes, ${center}D);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBits {

  // sign matrices are pure functions of (nPlanes, dim) — derived once per
  // JVM and shared by every task thread (read-only after construction)
  private val signsCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private[graft] def signs(nPlanes: Int, dim: Int): Array[Array[Double]] =
    signsCache.computeIfAbsent((nPlanes, dim), { case (np, d) =>
      val md = MessageDigest.getInstance("MD5")
      Array.tabulate(np) { p =>
        Array.tabulate(d) { i0 =>
          md.reset()
          val h = md.digest(s"plane:$p:${i0 + 1}"
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          // first hex digit ≤ '7' ⇔ high nibble of byte 0 ≤ 7
          if (((h(0) >> 4) & 0xf) <= 7) 1.0 else -1.0
        }
      }
    })

  /** The per-row kernel — also called from generated code. Rows whose
    * array contains a NULL element yield NULL (the [[L2Distance]] rule). */
  def compute(vec: ArrayData, nPlanes: Int, center: Double): ArrayData = {
    val n = vec.numElements()
    var i = 0
    while (i < n) { if (vec.isNullAt(i)) return null; i += 1 }
    val s = signs(nPlanes, n)
    val bits = new Array[Int](nPlanes)
    var p = 0
    while (p < nPlanes) {
      val sp = s(p)
      var acc = 0.0
      i = 0
      while (i < n) {
        acc += (vec.getDouble(i) - center) * sp(i)
        i += 1
      }
      bits(p) = if (acc >= 0) 1 else 0
      p += 1
    }
    new GenericArrayData(bits)
  }

  /** Column-API accessor: `ARRAY<INT>` of nPlanes 0/1 bits. */
  def hyperplaneBitsNative(vec: Column, nPlanes: Int, center: Double): Column =
    GraftSqlBridge.column(
      HyperplaneBits(GraftSqlBridge.expression(vec), nPlanes, center))
}
