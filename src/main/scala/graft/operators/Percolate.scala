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

  /** Small-registry fast path: the registry broadcasts, ONE term join +
    * a count-equality check. A million-rule registry won't broadcast —
    * that regime is [[matchesShuffled]]. */
  def matches(docs: DataFrame, idCol: Column, textCol: Column,
              queries: DataFrame): DataFrame =
    matchesOn(docTerms(docs, idCol, textCol), queries)

  /** The broadcast count-equality match over a prebuilt doc-term
    * relation — shared by [[matches]] and [[matchesHybrid]]'s hot-rule
    * leg. */
  private def matchesOn(docTermRel: DataFrame,
                        queries: DataFrame): DataFrame =
    docTermRel
      .join(broadcast(queries), Seq("term"))
      .groupBy(col("doc_id"), col("query_id"), col("n_terms"))
      .agg(count(lit(1)).as("matched"))
      .filter(col("matched") === col("n_terms"))
      .select(col("doc_id"), col("query_id"))

  /** The (doc_id, distinct term) relation both paths match against. */
  private def docTerms(docs: DataFrame, idCol: Column,
                       textCol: Column): DataFrame =
    docs
      .select(idCol.as("doc_id"),
        explode(graft.functions.TextFunctions.tokens(textCol)).as("term"))
      .dropDuplicates("doc_id", "term")

  /** Each rule's ROUTING term — its rarest term by corpus doc-frequency
    * (ties by term string): the candidate set for an AND rule is the
    * posting list of its rarest term, so routing there minimizes
    * Σ_rules df(routing) — the Elasticsearch-percolator candidate
    * strategy. A rule term absent from the corpus routes at df = 0
    * (the rule can never match — zero candidates is the right answer). */
  private def routingTerms(docTermRel: DataFrame,
                           queries: DataFrame): DataFrame = {
    val dfreq = docTermRel.groupBy("term").agg(count(lit(1)).as("df"))
    val t = queries.join(dfreq, Seq("term"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .groupBy(col("query_id"), col("n_terms"))
      .agg(min(struct(col("df"), col("term"))).as("r"))
    t.select(col("query_id"), col("n_terms"),
      col("r.term").as("term"), col("r.df").as("routing_df"))
  }

  /** Registry-scale percolation: NO broadcast of the registry — rules
    * route through their rarest term ([[routingTerms]]), candidates are
    * one SHUFFLED (term) join of the doc-term relation against the
    * routing-term table, and each candidate verifies its rule's full
    * AND bag against the doc's term set via two linear fetch joins
    * (unpinned — the fixed-N rule). Output is IDENTICAL to [[matches]]
    * over the served rules (rows-parity spec at a 100k-rule registry).
    *
    * Shape at scale: shuffle cost is Σ_rules df(rarest term) candidate
    * rows — never |docs| × |rules|, never the Σ_rules Σ_terms df(term)
    * the count-equality form pays. `maxDf` is the term-selectivity
    * valve: a rule whose RAREST term's df exceeds it (an all-stopword
    * rule — its candidate set is a full corpus scan by construction) is
    * EXCLUDED and surfaced by [[unservableRules]] — an audited
    * decision, never silent truncation (the dedup-family contract). */
  def matchesShuffled(docs: DataFrame, idCol: Column, textCol: Column,
                      queries: DataFrame,
                      maxDf: Long = Long.MaxValue): DataFrame = {
    val dt = docTerms(docs, idCol, textCol)
    val served = routingTerms(dt, queries)
      .filter(col("routing_df") <= maxDf)
      .select("query_id", "term")
    shuffledOn(dt, queries, served)
  }

  /** The routed-candidate verify leg over prebuilt relations — shared by
    * [[matchesShuffled]] and [[matchesHybrid]]. `servedRouting` is
    * (query_id, routing term) for the rules this leg serves. */
  private def shuffledOn(dt: DataFrame, queries: DataFrame,
                         servedRouting: DataFrame): DataFrame = {
    val ruleBags = queries.groupBy("query_id")
      .agg(sort_array(collect_set(col("term"))).as("qterms"))
    val docBags = dt.groupBy("doc_id")
      .agg(sort_array(collect_list(col("term"))).as("dterms"))
    dt.join(servedRouting, Seq("term"))
      .select(col("doc_id"), col("query_id"))
      .join(ruleBags, "query_id")
      .join(docBags, "doc_id")
      .filter(forall(col("qterms"), t => array_contains(col("dterms"), t)))
      .select(col("doc_id"), col("query_id"))
  }

  /** Hybrid router: NO rule is excluded. Rules whose rarest term is
    * selective enough (`routing_df ≤ maxDf`) serve through the
    * registry-scale shuffled path; the remainder — all-hot-term rules,
    * few by construction (every one of their terms is a near-stopword)
    * — route through the broadcast count-equality leg, which handles a
    * corpus-scan candidate set gracefully because its aggregate is
    * map-side partial. [[unservableRules]] is empty by construction
    * under this router (round-12 verdict item 7). The doc-term relation
    * and the routing-df table are computed ONCE and feed both legs.
    *
    * The broadcast leg's build side is the unserved RULE subset —
    * registry-bounded; a registry that is MOSTLY all-stopword rules
    * would degrade to the broadcast path's full cost, which is the
    * right answer (those rules' candidate sets are corpus scans however
    * they route — there is no cheaper plan, only an audited refusal,
    * which is what [[matchesShuffled]] + [[unservableRules]] provide
    * when refusal is preferable). */
  def matchesHybrid(docs: DataFrame, idCol: Column, textCol: Column,
                    queries: DataFrame, maxDf: Long): DataFrame = {
    val dt = docTerms(docs, idCol, textCol)
    val rt = routingTerms(dt, queries)
    val served = rt.filter(col("routing_df") <= maxDf)
      .select("query_id", "term")
    val hotRules = queries.join(
      rt.filter(col("routing_df") > maxDf).select("query_id"),
      Seq("query_id"), "left_semi")
    shuffledOn(dt, queries, served).unionByName(matchesOn(dt, hotRules))
  }

  /** The rules [[matchesShuffled]] dropped under its `maxDf` valve —
    * (query_id, routing term, routing_df) of every rule whose rarest
    * term is still hotter than the cap. Run alongside the match query
    * so a cap is always an audited decision; route these (few, all-hot-
    * term) rules to the broadcast path or rewrite them. */
  def unservableRules(docs: DataFrame, idCol: Column, textCol: Column,
                      queries: DataFrame, maxDf: Long): DataFrame =
    routingTerms(docTerms(docs, idCol, textCol), queries)
      .filter(col("routing_df") > maxDf)
      .select(col("query_id"), col("term"), col("routing_df"))
}
