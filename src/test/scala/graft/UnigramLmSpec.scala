package graft

import org.apache.spark.sql.functions._

import graft.operators.UnigramLm

/** Unigram-LM tokenizer semantics (SURVEY §7.4 round 12): integer
  * lexicographic Viterbi (fewest units, then highest score sum, then
  * shortest winning unit), hard-EM usage re-estimation, char coverage. */
class UnigramLmSpec extends SparkSuite {
  import spark.implicits._

  test("viterbi: fewest tokens dominates score") {
    val words = Seq(("abab", 1L), ("abcd", 1L)).toDF("word", "wcnt")
    val vocab = Seq("a" -> 10L, "b" -> 10L, "c" -> 5L, "d" -> 5L,
      "ab" -> 20L, "cd" -> 9L, "abab" -> 1L)
    val seg = UnigramLm.segmentWords(words, vocab)
      .as[(String, Long, Seq[String], Int)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap
    // "abab" is itself a unit: 1 token beats ab|ab's higher score sum
    assert(seg("abab") === (Seq("abab"), 1))
    // "abcd" has no whole-word unit: ab|cd (2) beats ab|c|d (3)
    assert(seg("abcd") === (Seq("ab", "cd"), 2))
  }

  test("viterbi: equal token count -> higher score sum; then shorter unit") {
    val words = Seq(("aaaa", 1L)).toDF("word", "wcnt")
    val vocab = Seq("a" -> 1L, "aa" -> 5L, "aaa" -> 2L)
    val seg = UnigramLm.segmentWords(words, vocab)
      .as[(String, Long, Seq[String], Int)].collect().head
    // ntok=2 paths: aa|aa (sum 10), a|aaa (3), aaa|a (3) -> aa|aa
    assert(seg._3 === Seq("aa", "aa") && seg._4 === 2)
  }

  test("viterbi: chars-only coverage segments per character") {
    val words = Seq(("xyz", 1L)).toDF("word", "wcnt")
    val vocab = Seq("x" -> 1L, "y" -> 1L, "z" -> 1L)
    val seg = UnigramLm.segmentWords(words, vocab)
      .as[(String, Long, Seq[String], Int)].collect().head
    assert(seg._3 === Seq("x", "y", "z") && seg._4 === 3)
  }

  private def docs = Seq(
    (1L, "alpha beta alpha"),
    (2L, "beta gamma delta"),
    (3L, "alpha alphabet beta")).toDF("doc_id", "text")

  test("trainUnigram: deterministic, chars never pruned, usage-scored") {
    val v1 = UnigramLm.trainUnigram(docs, col("text"), nMulti = 10,
      keepMulti = 4)
    val v2 = UnigramLm.trainUnigram(docs, col("text"), nMulti = 10,
      keepMulti = 4)
    assert(v1 === v2)
    val units = v1.map(_._1).toSet
    // every character of every corpus word survives
    val chars = "alphabetgammadelta".toSet.map((c: Char) => c.toString)
    assert(chars.subsetOf(units))
    // multi-char portion pruned to keepMulti
    assert(v1.count(_._1.length >= 2) === 4)
    // scores are usage counts: nonnegative, and some unit is actually used
    assert(v1.forall(_._2 >= 0L) && v1.exists(_._2 > 0L))
  }

  test("unigramTokens: per-doc counts; tokens bounded by words and chars") {
    val vocab = UnigramLm.trainUnigram(docs, col("text"), nMulti = 10,
      keepMulti = 4)
    val got = UnigramLm.unigramTokens(docs, col("doc_id"), col("text"),
        vocab).orderBy("doc_id")
      .as[(Long, Long, Long)].collect()
    assert(got.map(_._1).toSeq === Seq(1L, 2L, 3L))
    assert(got.map(_._3).toSeq === Seq(3L, 3L, 3L)) // n_words
    // each word is 1..len(word) tokens
    got.foreach { case (_, ntok, nw) =>
      assert(ntok >= nw && ntok <= 18)
    }
  }
}
