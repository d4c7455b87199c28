package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. All access goes through here so
  * every query reads the same way (plain parquet scan — Catalyst pushes
  * filters/projections into the scan; see `.explain` "PushedFilters").
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Memoized path→schema: `spark.read.parquet` without an explicit schema
  // re-reads parquet footers for schema inference on EVERY call — across a
  // 90+-query Verify/Bench run that per-query setup is a visible slice of
  // the ~0.5 s fixed overhead. Caching the StructType (plain, immutable,
  // session-independent data) and passing it via `.schema(...)` skips the
  // footer pass while every call still builds a fresh, session-local plan.
  //
  // Deliberately NOT a session-keyed DataFrame cache: a DataFrame strongly
  // references its SparkSession, so a WeakHashMap[SparkSession, DataFrame]
  // keeps its own keys reachable through the values and never evicts —
  // stopped sessions and their plans would be retained forever in
  // long-lived multi-session JVMs (test suites). Same pitfall note as
  // ExtensionQueries' ivfCache: cache plain data, never plans.
  //
  // CONTRACT: table schemas are assumed immutable for the lifetime of the
  // JVM — tests that rewrite data with a different schema use fresh dirs.
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val schema = schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
