package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Top-k-per-group without a per-group sort.
  *
  * The windowed formulation (`row_number() OVER (PARTITION BY g ORDER BY v)`
  * then `rn <= k`) shuffles and SORTS every row of every group. This
  * Aggregator keeps a bounded k-buffer per group with map-side partial
  * aggregation: each task emits at most k rows per local group, so the
  * shuffle carries O(groups × k × tasks) rows instead of the whole table —
  * the difference between sorting 100 TB and merging kilobytes. (Same heap
  * idea as `TakeOrderedAndProject`, lifted to per-group.)
  */
object TopK {

  type Entry = (Double, Long) // (orderValue, id) — desc by value, asc by id

  private val ord: Ordering[Entry] =
    Ordering.by[Entry, (Double, Long)] { case (v, id) => (-v, id) }

  private def trim(k: Int, b: Seq[Entry]): Seq[Entry] = b.sorted(ord).take(k)

  /** Per-row buffer update. The buffer invariant (always sorted, ≤ k)
    * makes the common case — a row that loses to the current k-th — ONE
    * comparison against the last entry with no allocation; the naive
    * `(b :+ e).sorted.take(k)` re-sorted and re-allocated an 11-element
    * seq per row (hostcap skew probe, 32M rows 50% one host: 6.2 s
    * naive → 4.0 s, vs 4.3 s for the hot-partition window — and the
    * window's hot host is ONE task at any cluster size, where these
    * partials spread over every task). */
  private def insert(k: Int, b: Seq[Entry], e: Entry): Seq[Entry] =
    if (b.size < k || ord.lt(e, b.last)) trim(k, b :+ e) else b

  /** Session-independent aggregator: a top-level class with TypeTag-based
    * encoders — an anonymous class using `spark.implicits` encoders
    * captures the SparkSession in its closure, which breaks task
    * serialization once anything non-serializable (e.g. an Observation
    * manager) hangs off the session. */
  private class TopKAgg(k: Int)
      extends Aggregator[(Long, Long, Double), Seq[Entry], Seq[Entry]] {
    def zero: Seq[Entry] = Seq.empty
    def reduce(b: Seq[Entry], a: (Long, Long, Double)): Seq[Entry] =
      insert(k, b, (a._3, a._2))
    def merge(b1: Seq[Entry], b2: Seq[Entry]): Seq[Entry] = trim(k, b1 ++ b2)
    def finish(r: Seq[Entry]): Seq[Entry] = r.sorted(ord)
    def bufferEncoder: Encoder[Seq[Entry]] = ExpressionEncoder[Seq[Entry]]()
    def outputEncoder: Encoder[Seq[Entry]] = ExpressionEncoder[Seq[Entry]]()
  }

  private class TopKAggS(k: Int)
      extends Aggregator[(String, Long, Double), Seq[Entry], Seq[Entry]] {
    def zero: Seq[Entry] = Seq.empty
    def reduce(b: Seq[Entry], a: (String, Long, Double)): Seq[Entry] =
      insert(k, b, (a._3, a._2))
    def merge(b1: Seq[Entry], b2: Seq[Entry]): Seq[Entry] = trim(k, b1 ++ b2)
    def finish(r: Seq[Entry]): Seq[Entry] = r.sorted(ord)
    def bufferEncoder: Encoder[Seq[Entry]] = ExpressionEncoder[Seq[Entry]]()
    def outputEncoder: Encoder[Seq[Entry]] = ExpressionEncoder[Seq[Entry]]()
  }

  /** Top-k rows per group: returns (groupCol, idCol, valueCol, rn), rn
    * 1-based in (value DESC, id ASC) order — same contract as the
    * `row_number` window formulation, different physical shape. */
  def topKPerGroup(spark: SparkSession, df: DataFrame, groupCol: String,
                   idCol: String, valueCol: String, k: Int): DataFrame = {
    import spark.implicits._
    val agg = new TopKAgg(k)
    explodeTopK(df.select(col(groupCol).cast("long"), col(idCol).cast("long"),
        col(valueCol).cast("double"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .agg(agg.toColumn.name("topk"))
      .toDF(groupCol, "topk"), groupCol, idCol, valueCol)
  }

  /** [[topKPerGroup]] for a STRING group key (host names, languages…).
    * Grouping directly on the string keeps the one-shuffle shape — the
    * map-side k-buffer means the exchange carries ≤ k entries per group
    * per task either way; a dense-id remap would itself need a distinct
    * + join keyed on the same string before any of that, i.e. two extra
    * shuffles to save shipping the key bytes once. */
  def topKPerGroupStr(spark: SparkSession, df: DataFrame, groupCol: String,
                      idCol: String, valueCol: String, k: Int): DataFrame = {
    import spark.implicits._
    val agg = new TopKAggS(k)
    explodeTopK(df.select(col(groupCol).cast("string"),
        col(idCol).cast("long"), col(valueCol).cast("double"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .agg(agg.toColumn.name("topk"))
      .toDF(groupCol, "topk"), groupCol, idCol, valueCol)
  }

  private def explodeTopK(grouped: DataFrame, groupCol: String,
                          idCol: String, valueCol: String): DataFrame =
    grouped
      .select(col(groupCol), posexplode(col("topk")).as(Seq("pos", "entry")))
      .select(col(groupCol),
        col("entry._2").as(idCol),
        col("entry._1").as(valueCol),
        (col("pos") + 1).as("rn"))
}
