package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.{Column, GraftSqlBridge}

/** Hash-table lookup of a literal (unit → score) vocabulary: returns the
  * unit's LONG score, or NULL when the string is not in the vocabulary.
  *
  * Exists because Spark has no O(1) literal-map lookup: `element_at` on
  * a `map_from_arrays` literal is a LINEAR scan over `ArrayBasedMapData`
  * keys, and the `array_contains` + `array_position` pair the unigram-LM
  * Viterbi fold used is two more linear scans — O(|vocab|) work per
  * candidate per position, the wrong shape at a real 32k SentencePiece
  * vocabulary (round-12 verdict item 5). This expression builds the
  * `java.util.HashMap` once per (de)serialization and answers each
  * candidate in O(1); it is the membership test AND the score fetch in
  * one call (NULL ⇔ absent).
  *
  * Sits inside the higher-order `aggregate` fold (interpreted), so the
  * interpreted `eval` is the hot path; `doGenCode` is provided for
  * direct column use. The vocabulary is driver-sized by the
  * [[graft.operators.UnigramLm]] contract (chars + top-k multi-char
  * units), same collect bound as the BPE merge table.
  */
case class VocabScore(child: Expression, units: Seq[String],
                      scores: Seq[Long])
    extends UnaryExpression {

  require(units.length == scores.length,
    s"vocab_score: ${units.length} units vs ${scores.length} scores")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "vocab_score"

  @transient private lazy val table: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](
      math.max(8, units.length * 2))
    var i = 0
    while (i < units.length) {
      // first occurrence wins — the array_position tie rule this replaces
      m.putIfAbsent(UTF8String.fromString(units(i)), scores(i))
      i += 1
    }
    m
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING input, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    table.get(v.asInstanceOf[UTF8String]) // null ⇔ not in vocab ⇒ result NULL

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tbl = ctx.addReferenceObj("vocabTable", table, "java.util.HashMap")
      val v = ctx.freshName("score")
      s"""
         |java.lang.Long $v = (java.lang.Long) $tbl.get($c);
         |if ($v == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $v.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VocabScore {
  def vocabScore(s: Column, units: Seq[String], scores: Seq[Long]): Column =
    GraftSqlBridge.column(
      VocabScore(GraftSqlBridge.expression(s), units, scores))
}
