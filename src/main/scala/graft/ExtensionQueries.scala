package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Extension queries (SURVEY.md §7.4) — LLM-data-pipeline operators beyond
  * reference parity: dedup family, similarity search, text analysis,
  * relational aggregates/joins/windows, event-time windows, multimodal.
  * Populated incrementally; every deterministic entry gets a DuckDB oracle.
  */
object ExtensionQueries {
  private type Q = (SparkSession, String) => DataFrame
  val all: Map[String, Q] = Map()
  val oracles: Map[String, String] = Map()
}
