package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Minimal query-term span — the classic proximity feature (Tao & Zhai
  * 2007, "An exploration of proximity measures in information
  * retrieval"): the length of the shortest token window in a document
  * containing ALL query terms. BM25/QL score WHAT matched;
  * the span scores HOW CLOSE together — the standard re-ranking
  * feature between bag-of-words retrieval and phrase search
  * (q_phrase_search is the exact-adjacency endpoint of this axis).
  *
  * The sweep formulation: walk the merged query-term position list in
  * order; at each position p the tightest window ENDING at p is
  * [min over terms of (latest occurrence of that term ≤ p), p], and
  * the document's minimal span is the minimum over all p. Each
  * "latest occurrence ≤ p" is one running-max window function, so the
  * whole sweep is |q| window columns over one doc-partitioned,
  * position-ordered pass — no self-joins, no quadratic term.
  *
  * All-integer arithmetic end to end (positions, running maxima,
  * least, min) — hash-exact cross-engine with no float rule needed.
  *
  * Scale shape: tokenize+posexplode map-side, then the positions are
  * FILTERED to the query terms before the window — the windowed
  * relation is matched-occurrences-sized, not corpus-sized; one window
  * shuffle on doc_id, one regroup. Docs missing any term drop out
  * (their running maxima never all become non-null).
  *
  * Output: (doc_id, min_span, n_occ) for every document containing all
  * `terms`; min_span = number of tokens in the tightest window
  * (|q| when the terms are adjacent in any order). */
object Proximity {

  def minSpan(df: DataFrame, idCol: Column, textCol: Column,
      terms: Seq[String]): DataFrame = {
    val pos = df
      .select(idCol.as("doc_id"),
        posexplode(tokens(textCol)).as(Seq("p0", "term")))
      .filter(col("term").isin(terms: _*))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("term"))
    val sweep = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lasts = terms.zipWithIndex.map { case (t, i) =>
      max(when(col("term") === t, col("pos"))).over(sweep).as(s"_l$i")
    }
    val lastCols = terms.indices.map(i => col(s"_l$i"))
    pos.select(col("doc_id") +: col("pos") +: lasts: _*)
      .withColumn("_span",
        when(lastCols.map(_.isNotNull).reduce(_ && _),
          col("pos") - least(lastCols: _*) + 1))
      .groupBy("doc_id")
      .agg(min(col("_span")).as("min_span"),
        count(lit(1)).as("n_occ"))
      .filter(col("min_span").isNotNull)
  }
}
