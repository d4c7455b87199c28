package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Positional phrase search — the exact-phrase primitive of a full-text
  * engine, expressed relationally: a (doc, term, pos) positional
  * inverted index, and phrase matching as a k-way equi-join
  * intersection of per-term candidate START positions (term i matches
  * at start s iff it occurs at s + i). The BM25/keyword family
  * (q_bm25_rank, q_keyword_count) sees bags of words; this is the
  * word-ORDER-exact complement — "slow hash batch" matches only that
  * consecutive sequence, never the three terms scattered.
  *
  * Scale shape: postings are one map-side posexplode; each phrase term
  * FILTERS the postings before any join (predicate pushdown to the
  * scan — per-side size is that term's corpus frequency, not the
  * corpus), and the k−1 joins are keyed on (doc, start), so rare terms
  * prune the pipeline immediately and AQE broadcasts the smallest
  * side. A standing phrase index persists [[postings]] partitioned or
  * bucketed by term, making each per-term fetch a pruned scan.
  */
object PhraseSearch {

  /** The (doc_id, pos, term) positional-postings relation (0-based
    * positions). Persist bucketed by `term` for a standing index. */
  def postings(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    Spread.forKernel(df.select(idCol.as("doc_id"), textCol.as("_t")))
      .select(col("doc_id"),
        posexplode(graft.functions.TextFunctions.tokens(col("_t")))
          .as(Seq("pos", "term")))

  /** Docs containing the exact consecutive `phrase`, with per-doc
    * occurrence counts. Each (doc, start) is unique per term side, so
    * the join intersection is exact and the count is the number of
    * phrase occurrences. */
  def phraseCounts(df: DataFrame, idCol: Column, textCol: Column,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val p = postings(df, idCol, textCol)
    val starts = phrase.zipWithIndex.map { case (t, i) =>
      p.filter(col("term") === t)
        .select(col("doc_id"), (col("pos") - i).as("start"))
    }
    starts.reduce((a, b) => a.join(b, Seq("doc_id", "start")))
      .groupBy("doc_id").agg(count(lit(1)).as("hits"))
  }

  /** Matching docs with a result SNIPPET: `ctx` tokens of context on
    * each side of the FIRST phrase occurrence (the search-result
    * highlight window). The phrase match runs on the postings joins
    * (codegen, distributed); only matching docs pay the token-array
    * fetch join and the bounded slice — never a corpus-wide
    * interpreted pass. Output: (doc_id, hits, snippet). */
  def phraseSnippets(df: DataFrame, idCol: Column, textCol: Column,
                     phrase: Seq[String], ctx: Int = 2): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val p = postings(df, idCol, textCol)
    val starts = phrase.zipWithIndex.map { case (t, i) =>
      p.filter(col("term") === t)
        .select(col("doc_id"), (col("pos") - i).as("start"))
    }
    val hits = starts.reduce((a, b) => a.join(b, Seq("doc_id", "start")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("hits"), min(col("start")).as("s0"))
    val win = phrase.length + 2 * ctx // slice length, clamped at the end
    hits.join(
        df.select(idCol.as("doc_id"),
          graft.functions.TextFunctions.tokens(textCol).as("tk")),
        "doc_id")
      // postings are 0-based, slice is 1-based: first window token is
      // max(1, s0 + 1 - ctx)
      .withColumn("snippet", concat_ws(" ",
        slice(col("tk"), greatest(lit(1), col("s0") + 1 - ctx), lit(win))))
      .select(col("doc_id"), col("hits"), col("snippet"))
  }
}
