package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document Gopher repetition statistics — the whole
  * gram-count/top-gram/coverage computation in ONE JVM pass per row.
  *
  * Every aggregate in the repetition suite is grouped by `doc_id`, i.e.
  * the measure is a pure per-document function: the previous
  * formulation nevertheless paid a doc-keyed window shuffle (4 lead
  * columns), a (doc, n, hash) count shuffle, a doc regroup AND a
  * tokenizing join back — three exchanges plus a second corpus scan for
  * what one kernel call computes in-row (guide §2.4: remove shuffles
  * outright). At 100 TB this is the difference between three corpus
  * shuffles and an embarrassingly-parallel scan projection.
  *
  * Bit-identical contract with the declarative formulation (asserted in
  * SamplingSpec on hand fixtures and by the unchanged q_gopher_repetition
  * oracle):
  *  - tokens: lowercase, split `\s+`, drop empties (the
  *    [[HashedShingles]] tokenizer);
  *  - char lengths are CODEPOINT counts (Spark `length`);
  *  - per gram grain n ∈ {2, 3}: the single most frequent space-joined
  *    token n-gram, count ties broken by max summed token chars (glen);
  *    emitted as the exact integer product c·glen (grams keyed by their
  *    STRING — the oracle's grouping; the old Spark side grouped by
  *    xxhash64 of the same string, identical absent collisions);
  *  - dup5: summed token chars over positions covered by ANY 5-gram
  *    occurring ≥ 2 times (overlapping occurrences counted once);
  *  - total: summed token chars (the n=1 Σ c·glen).
  *
  * Returns a 0/1-element ARRAY of the stats struct: a zero-token
  * document yields an empty array, so `explode` reproduces the old
  * inner-join drop without a filter (a filter on the struct would be
  * pushed below the projection and re-evaluate the kernel per row — the
  * round-10 q_json_extract trap). */
case class GopherRepStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(GopherRepStats.entryType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gopher_rep_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING input")

  override def nullSafeEval(input: Any): Any =
    GopherRepStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.GopherRepStats$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GopherRepStats {

  val entryType: StructType = StructType(Seq(
    StructField("total_chars", LongType, nullable = false),
    StructField("top2", LongType, nullable = false),
    StructField("top3", LongType, nullable = false),
    StructField("dup5", LongType, nullable = false)))

  private val whitespace = java.util.regex.Pattern.compile("\\s+")

  /** The per-row kernel — also called from generated code. */
  def compute(text: UTF8String): ArrayData = {
    val toks = whitespace.split(text.toLowerCase.toString, -1)
      .filter(_.nonEmpty)
    val m = toks.length
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val lens = new Array[Long](m)
    var total = 0L
    var i = 0
    while (i < m) {
      val t = toks(i)
      val l = t.codePointCount(0, t.length).toLong
      lens(i) = l
      total += l
      i += 1
    }
    // c·glen of the most frequent n-gram (count ties → max glen); glen
    // is a function of the gram string, so one value per map entry
    def topGram(n: Int): Long = {
      if (m < n) return 0L
      val counts = new java.util.HashMap[String, Array[Long]]()
      var i = 0
      while (i <= m - n) {
        val sb = new java.lang.StringBuilder(toks(i))
        var g = lens(i)
        var j = 1
        while (j < n) {
          sb.append(' ').append(toks(i + j))
          g += lens(i + j)
          j += 1
        }
        val e = counts.get(sb.toString)
        if (e == null) counts.put(sb.toString, Array(1L, g))
        else e(0) += 1L
        i += 1
      }
      var bc = 0L
      var bg = 0L
      val it = counts.values().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e(0) > bc || (e(0) == bc && e(1) > bg)) { bc = e(0); bg = e(1) }
      }
      bc * bg
    }
    // coverage: token positions inside any >=2-count 5-gram occurrence
    var dup5 = 0L
    if (m >= 5) {
      val c5 = new java.util.HashMap[String, Array[Int]]()
      val keys = new Array[String](m - 4)
      var i = 0
      while (i <= m - 5) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < 5) { sb.append(' ').append(toks(i + j)); j += 1 }
        val key = sb.toString
        keys(i) = key
        val c = c5.get(key)
        if (c == null) c5.put(key, Array(1)) else c(0) += 1
        i += 1
      }
      val covered = new Array[Boolean](m)
      i = 0
      while (i <= m - 5) {
        if (c5.get(keys(i))(0) >= 2) {
          var j = i
          while (j < i + 5) { covered(j) = true; j += 1 }
        }
        i += 1
      }
      i = 0
      while (i < m) { if (covered(i)) dup5 += lens(i); i += 1 }
    }
    new GenericArrayData(Array[Any](
      InternalRow(total, topGram(2), topGram(3), dup5)))
  }

  /** 0/1-element stats-struct array for [[compute]] over a text column. */
  def repStats(text: Column): Column =
    GraftSqlBridge.column(GopherRepStats(GraftSqlBridge.expression(text)))
}
