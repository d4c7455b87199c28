package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.unsafe.types.UTF8String

/** Native feature-hash text embedding: one tight JVM pass per row instead
  * of the interpreted higher-order pipeline in
  * [[graft.functions.VectorFunctions.featureHashEmbeddingD]] — which costs
  * O(tokens × dim) interpreted lambda dispatches per row and dominates
  * index builds at realistic dimensions (measured: 26 s of a 40 s
  * 10k-doc × 384-dim build).
  *
  * Bit-identical contract with the HOF/oracle formulation:
  * lowercase → split `\s+` → drop empties → md5 first-16-bits mod dim →
  * counts → L2 normalize (sum of squares accumulated in index order);
  * empty token set → zero vector; NULL text → NULL.
  */
case class FeatureHashEmbed(child: Expression, dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "feature_hash_embed"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && dim > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING input and dim > 0")

  override def nullSafeEval(input: Any): Any =
    FeatureHashEmbed.compute(input.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.FeatureHashEmbed$$.MODULE$$.compute($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FeatureHashEmbed {

  private val whitespace = java.util.regex.Pattern.compile("\\s+")
  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** The per-row kernel — also called from generated code. */
  def compute(text: UTF8String, dim: Int): ArrayData = {
    val md = md5Local.get()
    val counts = new Array[Double](dim)
    // same tokenization as lower() + split("\s+") + drop-empties
    val it = whitespace.split(text.toLowerCase.toString, -1)
    var t = 0
    while (t < it.length) {
      val tok = it(t)
      if (!tok.isEmpty) {
        md.reset()
        val d = md.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // first 4 md5 hex digits as an int = first 16 bits of the digest
        val h = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
        counts(h % dim) += 1.0
      }
      t += 1
    }
    var ss = 0.0
    var i = 0
    while (i < dim) { ss += counts(i) * counts(i); i += 1 }
    val nrm = math.sqrt(ss)
    if (nrm > 0) {
      i = 0
      while (i < dim) { counts(i) /= nrm; i += 1 }
    }
    new GenericArrayData(counts)
  }

  /** Column-API accessor (double output, matching the HOF formulation). */
  def featureHashNative(text: Column, dim: Int): Column =
    GraftSqlBridge.column(
      FeatureHashEmbed(GraftSqlBridge.expression(text), dim))
}
