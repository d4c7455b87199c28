package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** The C4 rule cleanse (Raffel et al. 2020 §2.2, the "Colossal Clean
  * Crawled Corpus" recipe) — the line-level web-page filter family that
  * precedes every Gopher/CCNet-style quality model in a real
  * pre-training pipeline (`q_gopher_rules` is the DOC-level rule
  * family; these are the LINE-level retention rules plus page-level
  * drop rules):
  *
  *   - retain only lines ending in a terminal punctuation mark
  *     (period, exclamation mark, question mark, end quotation mark);
  *   - retain only lines with at least `minWordsPerLine` (3) words;
  *   - drop any line containing the word "javascript";
  *   - drop any PAGE containing "lorem ipsum" or a curly bracket;
  *   - drop any page with fewer than `minKeptLines` (5) surviving
  *     lines (the paper counts sentences; kept lines — each ends in
  *     terminal punctuation — are the deterministic line-granular
  *     proxy, documented here so the oracle replays it 1:1).
  *
  * Scale shape: the WHOLE cleanse is one projection over the line
  * ARRAY with higher-order functions (`filter`/`exists` over
  * `split(page, '\n')`) — zero shuffles, zero explodes, fully
  * map-side and whole-stage-codegen'd; at 100 TB this runs at scan
  * speed, which is exactly why C4-class rule filters are the first
  * funnel stage. Every predicate is a substring/regex-free string
  * primitive expressible 1:1 in the DuckDB oracle.
  *
  * Output: (doc_id, n_lines, n_kept_lines, page_kept, clean_len,
  * clean_md5) — the audit row per page; `clean_*` are NULL for
  * dropped pages. The cleaned text itself is `cleanText` for
  * pipeline composition.
  */
object C4Filters {

  /** Terminal punctuation per the paper: . ! ? and end quote. */
  private val terminal = Seq(".", "!", "?", "\"")

  /** The page-drop markers (lowercase match). */
  private val pageDrop = Seq("lorem ipsum", "{")

  private def lineKept(l: Column, minWordsPerLine: Int): Column =
    right(l, lit(1)).isin(terminal: _*) &&
      size(tokens(l)) >= minWordsPerLine &&
      !lower(l).contains("javascript")

  private def keptLines(page: Column, minWordsPerLine: Int): Column =
    filter(split(page, "\n"), l => lineKept(l, minWordsPerLine))

  private def joined(page: Column, kept: Column,
      minKeptLines: Int): Column = {
    val dropped = pageDrop.map(m => lower(page).contains(m)).reduce(_ || _)
    when(!dropped && size(kept) >= minKeptLines, array_join(kept, "\n"))
  }

  /** Surviving lines of a page, original order, as one '\n'-joined
    * string — NULL when the page itself is dropped. */
  def cleanText(page: Column, minWordsPerLine: Int = 3,
      minKeptLines: Int = 5): Column =
    joined(page, keptLines(page, minWordsPerLine), minKeptLines)

  /** The per-page audit frame (see object doc). */
  def clean(df: DataFrame, idCol: Column, pageCol: Column,
      minWordsPerLine: Int = 3, minKeptLines: Int = 5): DataFrame = {
    val kept = keptLines(pageCol, minWordsPerLine)
    val clean = joined(pageCol, kept, minKeptLines)
    df.select(idCol.as("doc_id"),
      size(split(pageCol, "\n")).as("n_lines"),
      size(kept).as("n_kept_lines"),
      clean.isNotNull.as("page_kept"),
      length(clean).as("clean_len"),
      md5(clean).as("clean_md5"))
  }
}
