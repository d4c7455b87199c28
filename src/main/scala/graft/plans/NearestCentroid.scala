package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, GraftSqlBridge}

/** Native argmin over a centroid matrix: `STRUCT<cell INT, dist DOUBLE>`
  * of the nearest row of `cents` to the input vector, with the
  * (dist, index) lexicographic tiebreak.
  *
  * This is THE index-build kernel: [[graft.operators.Ann.assignCells]]
  * (every vector → its IVF cell) and [[graft.operators.Pq.encode]]
  * (every subvector → its codebook code) are full-corpus passes at
  * 100 TB, and their higher-order formulation evaluates `l2_native`
  * inside an interpreted `transform` lambda — k× per row with a lambda
  * dispatch per element (measured: q_ann_pq ≈3 s at sf0.1, ~2M
  * interpreted evals; the [[HyperplaneBits]] story again). This kernel
  * is one compiled loop over k×dim doubles per row; the matrix rides in
  * the expression as a reference object (k×dim — the same driver-sized
  * payload the HOF form ships as a literal).
  *
  * Bit contract with the HOF argmin (parity-tested in PqSpec): distances
  * accumulate left-to-right in DOUBLE; strictly-smaller wins, equal
  * distance keeps the earlier index (= the array_sort (d, cell) struct
  * order). Rows whose array contains a NULL element yield NULL (the
  * [[L2Distance]] rule); dimension mismatch against the matrix yields
  * NULL the same way. */
case class NearestCentroid(child: Expression, cents: Seq[Seq[Double]])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("dist", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroid"
  override def nullable: Boolean = true

  @transient private lazy val matrix: Array[Array[Double]] =
    cents.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if cents.nonEmpty &&
        cents.forall(_.length == cents.head.length) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<DOUBLE> input and a non-empty " +
        "rectangular centroid matrix")
  }

  override def nullSafeEval(input: Any): Any =
    NearestCentroid.compute(input.asInstanceOf[ArrayData], matrix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("cents", matrix, "double[][]")
    nullSafeCodeGen(ctx, ev, { c =>
      val r = ctx.freshName("best")
      s"""
         |InternalRow $r = graft.plans.NearestCentroid$$.MODULE$$.compute($c, $m);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroid {

  /** The per-row kernel — also called from generated code. */
  def compute(vec: ArrayData, cents: Array[Array[Double]]): InternalRow = {
    val dim = vec.numElements()
    if (cents(0).length != dim) return null
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (vec.isNullAt(i)) return null
      v(i) = vec.getDouble(i)
      i += 1
    }
    var bestCell = 0
    // argmin over the SQUARED accumulation: sqrt is monotone so the
    // winner is unchanged, but comparing sqrt'd values can collapse two
    // distinct squared distances onto the same double — the q_pq_adc
    // DuckDB oracle orders by the squared distance (d2doc), so a
    // sqrt-then-compare here is a latent data-dependent hash mismatch
    // (plus one wasted sqrt per candidate per row). Only the winning
    // distance is sqrt'd, for the output struct.
    var bestD = Double.PositiveInfinity
    var k = 0
    while (k < cents.length) {
      val c = cents(k)
      var acc = 0.0
      i = 0
      while (i < dim) {
        val d = v(i) - c(i)
        acc += d * d
        i += 1
      }
      // strictly smaller wins ⇒ ties keep the earlier index — identical
      // to sorting (d2, cell) structs and taking the head
      if (acc < bestD) { bestD = acc; bestCell = k }
      k += 1
    }
    new GenericInternalRow(Array[Any](bestCell, math.sqrt(bestD)))
  }

  /** Column accessor: `STRUCT<cell INT, dist DOUBLE>` of the nearest
    * matrix row (row index = cell id — callers whose cell ids are not
    * 0..k−1 positions must remap). */
  def nearestCentroid(vec: Column, cents: Seq[Seq[Double]]): Column =
    GraftSqlBridge.column(
      NearestCentroid(GraftSqlBridge.expression(vec), cents))
}
