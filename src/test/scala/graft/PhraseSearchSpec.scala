package graft

import org.apache.spark.sql.functions._

import graft.operators.PhraseSearch

/** Exact-phrase semantics of the positional-postings intersection. */
class PhraseSearchSpec extends SparkSuite {
  import spark.implicits._

  private def docs = Seq(
    (1L, "hash join beats nested loop hash join sometimes"),
    (2L, "join hash is not the phrase"),
    (3L, "HASH   Join mixed case and spacing"),
    (4L, "a a a"),
    (5L, "unrelated words entirely"))
    .toDF("doc_id", "text")

  test("phraseCounts: consecutive occurrences only, counted per doc") {
    val out = PhraseSearch.phraseCounts(docs, col("doc_id"), col("text"),
        Seq("hash", "join"))
      .as[(Long, Long)].collect().toMap
    // doc 1 has two occurrences; doc 2 has the REVERSED pair only;
    // doc 3 matches case-insensitively across repeated whitespace
    assert(out === Map(1L -> 2L, 3L -> 1L))
  }

  test("phraseCounts: repeated-term phrase counts overlapping starts") {
    val out = PhraseSearch.phraseCounts(docs, col("doc_id"), col("text"),
        Seq("a", "a"))
      .as[(Long, Long)].collect().toMap
    assert(out === Map(4L -> 2L)) // "a a a" -> starts 0 and 1
  }

  test("phraseSnippets: window around the FIRST hit, clamped at both " +
      "edges") {
    val out = PhraseSearch.phraseSnippets(docs, col("doc_id"), col("text"),
        Seq("hash", "join"), ctx = 2)
      .as[(Long, Long, String)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    // doc 1: first hit at pos 0 -> left clamp; 6-token window from start
    assert(out(1L) === ((2L, "hash join beats nested loop hash")))
    // doc 3: hit at pos 0 of a 6-token doc -> window is the whole doc
    assert(out(3L) === ((1L, "hash join mixed case and spacing")))
    assert(!out.contains(2L)) // reversed pair never matches
    // right-edge clamp: hit near the end keeps the snippet in bounds
    val tail = Seq((9L, "one two three hash join"))
      .toDF("doc_id", "text")
    val t = PhraseSearch.phraseSnippets(tail, col("doc_id"), col("text"),
        Seq("hash", "join"), ctx = 2)
      .as[(Long, Long, String)].head()
    assert(t === ((9L, 1L, "two three hash join")))
  }

  test("postings: 0-based positions in token order") {
    val p = PhraseSearch.postings(docs.filter(col("doc_id") === 2L),
        col("doc_id"), col("text"))
      .orderBy("pos").select("pos", "term")
      .as[(Int, String)].collect()
    assert(p.take(3) === Array((0, "join"), (1, "hash"), (2, "is")))
  }
}
