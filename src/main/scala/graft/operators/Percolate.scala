package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Percolation / reverse search: registered queries matched against
  * docs (the alerting & routing shape). Each registered query is an
  * AND bag of terms — `queries(query_id, term, n_terms)`, registry-
  * sized by construction; a doc matches iff it contains every term.
  * One broadcast term join + a count-equality check — never a
  * per-(doc × query) scan; per-doc work is its distinct-term count
  * times the registry's term selectivity. */
object Percolate {

  def matches(docs: DataFrame, idCol: Column, textCol: Column,
              queries: DataFrame): DataFrame =
    docs
      .select(idCol.as("doc_id"),
        explode(graft.functions.TextFunctions.tokens(textCol)).as("term"))
      .dropDuplicates("doc_id", "term")
      .join(broadcast(queries), Seq("term"))
      .groupBy(col("doc_id"), col("query_id"), col("n_terms"))
      .agg(count(lit(1)).as("matched"))
      .filter(col("matched") === col("n_terms"))
      .select(col("doc_id"), col("query_id"))
}
