package graft.plans

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.unsafe.types.UTF8String

/** Native producer of md5-derived n-gram shingle hashes — the shared
  * expensive kernel under SimHash, MinHash, n-gram Jaccard, and document
  * fingerprinting. One JVM pass per row replaces tokenize → shingle →
  * per-element md5 through three interpreted higher-order functions.
  *
  * Bit-identical contract with the declarative formulation
  * (`transform(wordShingles(text, n), tokenHash16/32)`):
  *  - tokens: lowercase, split `\s+`, drop empties;
  *  - shingles: n-token windows joined with " "; if `collapse` and the
  *    text has fewer than n tokens, ONE whole-text shingle (even when
  *    empty → "") — matching `Dedup.wordShingles`; without `collapse`
  *    (token mode) short/empty texts just yield their tokens;
  *  - hash: first `hexDigits` md5 hex digits as an unsigned BIGINT
  *    (= `conv(substring(md5(s), 1, hexDigits), 16, 10)`).
  */
case class HashedShingles(child: Expression, n: Int, hexDigits: Int,
                          collapse: Boolean) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hashed_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n > 0 &&
        hexDigits > 0 && hexDigits <= 15) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, n > 0, 0 < hexDigits <= 15")

  override def nullSafeEval(input: Any): Any =
    HashedShingles.compute(input.asInstanceOf[UTF8String], n, hexDigits,
      collapse)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.HashedShingles$$.MODULE$$.compute($c, $n, $hexDigits, $collapse)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native 16-bit SimHash over the token stream — the whole
  * hash-and-bit-vote loop in one JVM pass. Bit-identical to
  * [[graft.operators.Dedup.simhash16]]'s declarative formulation: bit b of
  * the result is set iff Σ_tokens (bit_b(md5₁₆(token)) ? +1 : −1) > 0. */
case class SimHash16(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash16"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING input")

  override def nullSafeEval(input: Any): Any =
    SimHash16.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.SimHash16$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash16 {
  def compute(text: UTF8String): Long = {
    val hashes = HashedShingles.compute(text, 1, 4, collapse = false)
    val sums = new Array[Long](16)
    var i = 0
    val n = hashes.numElements()
    while (i < n) {
      val h = hashes.getLong(i)
      var b = 0
      while (b < 16) {
        sums(b) += (if (((h >> b) & 1L) == 1L) 1L else -1L)
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 16) { if (sums(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def simhash16Native(text: Column): Column =
    GraftSqlBridge.column(SimHash16(GraftSqlBridge.expression(text)))
}

object HashedShingles {

  private val whitespace = java.util.regex.Pattern.compile("\\s+")
  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private def hashPrefix(md: MessageDigest, s: String, hexDigits: Int): Long = {
    md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    // first hexDigits hex chars = first hexDigits*4 bits, big-endian
    var v = 0L
    var consumed = 0
    var i = 0
    while (consumed < hexDigits) {
      val b = d(i) & 0xff
      if (hexDigits - consumed >= 2) { v = (v << 8) | b; consumed += 2 }
      else { v = (v << 4) | (b >> 4); consumed += 1 }
      i += 1
    }
    v
  }

  /** The per-row kernel — also called from generated code. */
  def compute(text: UTF8String, n: Int, hexDigits: Int,
              collapse: Boolean): ArrayData = {
    val md = md5Local.get()
    val raw = whitespace.split(text.toLowerCase.toString, -1)
    val toks = raw.filter(_.nonEmpty)
    val out: Array[Long] =
      if (toks.length >= n) {
        val m = toks.length - n + 1
        val a = new Array[Long](m)
        var i = 0
        while (i < m) {
          val sb = new java.lang.StringBuilder(toks(i))
          var j = 1
          while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
          a(i) = hashPrefix(md, sb.toString, hexDigits)
          i += 1
        }
        a
      } else if (collapse) {
        Array(hashPrefix(md, toks.mkString(" "), hexDigits))
      } else {
        toks.map(hashPrefix(md, _, hexDigits))
      }
    new GenericArrayData(out)
  }

  /** Token-hash array (n=1, no collapse): native form of
    * `transform(tokens(text), tokenHash16)`. */
  def tokenHashes16(text: Column): Column = shingleHashes(text, 1, 4, false)

  /** Shingle-hash array, `Dedup.wordShingles` collapse semantics. */
  def shingleHashes(text: Column, n: Int, hexDigits: Int,
                    collapse: Boolean = true): Column =
    GraftSqlBridge.column(
      HashedShingles(GraftSqlBridge.expression(text), n, hexDigits, collapse))
}
