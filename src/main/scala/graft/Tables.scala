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

  // Memoized per (session, path): `spark.read.parquet` re-lists the
  // directory and re-reads footers for schema inference on EVERY call —
  // across a 67-query Verify/Bench run that per-query setup is a visible
  // slice of the ~0.5 s fixed overhead. The cached object is just the
  // analyzed logical plan (immutable); each query still plans and scans
  // independently.
  //
  // CONTRACT: table dirs are assumed immutable for the lifetime of a
  // session — an in-session rewrite of a cached path serves the stale
  // file listing (tests that rewrite data use fresh dirs). The outer map
  // holds sessions WEAKLY so long-lived multi-session JVMs (test suites)
  // don't retain stopped sessions and their plans forever.
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]())

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val perSession = cache.synchronized {
      cache.computeIfAbsent(spark,
        _ => new java.util.concurrent.ConcurrentHashMap[String, DataFrame]())
    }
    perSession.computeIfAbsent(s"$sfDir/$name.parquet",
      path => spark.read.parquet(path))
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
