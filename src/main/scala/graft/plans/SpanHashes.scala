package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.unsafe.types.UTF8String

/** Native producer of the (start, xxhash64) span-shingle relation — every
  * full `n`-token window's 64-bit hash, in ONE JVM pass per row.
  *
  * The span family (duplicate-span removal, span decontamination) only
  * needs per-position window hashes, a pure per-document function: the
  * lead-window formulation nevertheless paid a posexplode plus a
  * doc_id-partitioned window shuffle-and-sort per corpus side before any
  * cross-document work started (guide §2.4: remove shuffles outright).
  * This kernel emits the same rows from the scan projection.
  *
  * Bit-identical contract with the declarative formulation (kept as
  * `Dedup.spanShinglesWindowed`, parity-asserted in DedupSpec):
  *  - tokens: lowercase, split `\s+`, drop empties (the
  *    [[HashedShingles]] tokenizer);
  *  - hash: Spark's `xxhash64` (seed 42) of the space-joined n-token
  *    window — [[XxHash64Function]] on the UTF8String bytes, exactly
  *    what the codegen'd expression computes;
  *  - documents shorter than `n` emit no windows (empty array). */
case class SpanShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(SpanShingleHashes.entryType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "span_shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input and n > 0")

  override def nullSafeEval(input: Any): Any =
    SpanShingleHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.SpanShingleHashes$$.MODULE$$.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SpanShingleHashes {

  val entryType: StructType = StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("h", LongType, nullable = false)))

  private val whitespace = java.util.regex.Pattern.compile("\\s+")

  /** The per-row kernel — also called from generated code. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = whitespace.split(text.toLowerCase.toString, -1)
      .filter(_.nonEmpty)
    val m = toks.length
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    var i = 0
    while (i <= m - n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      val h = XxHash64Function.hash(
        UTF8String.fromString(sb.toString), StringType, 42L)
      out(i) = InternalRow(i, h)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** (start, h) struct array over a text column. */
  def spanHashes(text: Column, n: Int): Column =
    GraftSqlBridge.column(
      SpanShingleHashes(GraftSqlBridge.expression(text), n))
}

/** Native producer of the RAW space-joined n-token window strings —
  * the string-typed sibling of [[SpanShingleHashes]] for consumers that
  * group the gram strings themselves (the vocabulary-growth TYPE space,
  * where a hash collision would merge two types). Same tokenizer, same
  * full-windows-only semantics (docs shorter than `n` emit an empty
  * array); replaces a posexplode + doc-partitioned lead-window
  * shuffle-and-sort with a scan projection. */
case class ShingleStrings(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_strings"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input and n > 0")

  override def nullSafeEval(input: Any): Any =
    ShingleStrings.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.ShingleStrings$$.MODULE$$.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleStrings {

  private val whitespace = java.util.regex.Pattern.compile("\\s+")

  /** The per-row kernel — also called from generated code. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = whitespace.split(text.toLowerCase.toString, -1)
      .filter(_.nonEmpty)
    val m = toks.length
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    var i = 0
    while (i <= m - n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Raw n-token window strings over a text column. */
  def shingleStrings(text: Column, n: Int): Column =
    GraftSqlBridge.column(
      ShingleStrings(GraftSqlBridge.expression(text), n))
}
