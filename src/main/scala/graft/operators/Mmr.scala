package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR'98) — the
  * classic diversity rerank: greedily select k of the top-N retrieval
  * candidates, scoring each unpicked candidate by
  * `λ·sim(q, c) − (1−λ)·max_{s∈selected} sim(c, s)` so the second pick
  * of a near-duplicate pair is penalized by its similarity to the
  * first. λ is fixed at 1/2 (an exact binary fraction — the oracle
  * determinism rule).
  *
  * Architecture: MMR is a SERVING-time rerank over a candidate set the
  * retrieval tier already bounded (top-N), so the entire greedy loop is
  * ONE lazy Catalyst expression over a single grouped row — the corpus
  * is scanned exactly once (by the candidate query the caller supplies);
  * no per-step corpus joins, no driver-side collect, no eager work at
  * construction. An unrolled k-step join formulation would replay the
  * candidate lineage O(k) times; the fold replays it once.
  *
  * Determinism: query-sims arrive ROUNDED (round 6) from the candidate
  * retrieval; pairwise sims are rounded the same way inside the fold;
  * λ·a − (1−λ)·b over rounded doubles is exact IEEE arithmetic, so both
  * engines compute bit-equal scores, and the argmax breaks ties on the
  * smaller id. The DuckDB oracle replays the greedy loop as an unrolled
  * CTE chain (the q_bpe_train pattern).
  */
object Mmr {

  /** Index-ordered cosine over two ARRAY<DOUBLE> columns, rounded to 6 —
    * the HOF twin of the native kernel, matching DuckDB's
    * list_sum(list_transform(...)) replay term for term. */
  private def cosC(a: Column, b: Column): Column =
    round(
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, v) => s + v) /
        (sqrt(aggregate(a, lit(0.0), (s, x) => s + x * x)) *
          sqrt(aggregate(b, lit(0.0), (s, x) => s + x * x))), 6)

  /** The whole greedy loop as one expression over a sorted
    * candidate-struct array column — shared by the single-query and
    * grouped forms. Returns the selected array<struct<rank,pos,id,score>>. */
  private def greedyFold(csCol: Column, k: Int): Column = {
    val n = size(csCol)
    def candAt(p: Column) = element_at(csCol, p + 1)
    // marginal score of candidate position p against the selected list
    def mmrOf(sel: Column, p: Column): Column = {
      val c = candAt(p)
      val pen = when(size(sel) === 0, lit(0.0)).otherwise(
        array_max(transform(sel, s =>
          cosC(c.getField("vec"), candAt(s.getField("pos")).getField("vec")))))
      lit(0.5) * c.getField("qsim") - lit(0.5) * pen
    }
    val zero = expr(
      "cast(array() as array<struct<rank:int,pos:int,id:bigint,score:double>>)")
    // n = 0 guard: sequence(0, n-1) on an empty candidate set yields
    // [0, -1] and candAt(-1) = element_at(cs, 0) throws Spark's invalid-
    // index error mid-fold. CaseWhen evaluates branches conditionally at
    // runtime, so the fold below never runs when there are no candidates.
    when(n === 0, zero).otherwise(aggregate(
      sequence(lit(1), lit(k)),
      zero,
      (sel, step) => {
        // argmax over unselected positions by (score desc, id asc)
        val best = aggregate(
          filter(sequence(lit(0), n - 1),
            p => !exists(sel, s => s.getField("pos") === p)),
          struct(lit(Double.NegativeInfinity).as("score"),
            lit(-1).as("pos"), lit(Long.MaxValue).as("id")),
          (b, p) => {
            val m = mmrOf(sel, p)
            val id = candAt(p).getField("id")
            when(m > b.getField("score") ||
                (m === b.getField("score") && id < b.getField("id")),
              struct(m.as("score"), p.as("pos"), id.as("id")))
              .otherwise(b)
          })
        // k > N leaves no unselected position: keep the state unchanged
        // instead of appending the -Inf sentinel
        when(best.getField("pos") >= 0,
          array_append(sel, struct(
            step.cast("int").as("rank"),
            best.getField("pos").as("pos"),
            best.getField("id").as("id"),
            best.getField("score").as("score"))))
          .otherwise(sel)
      }))
  }

  private def candStruct(idCol: Column, vecCol: Column,
                         qsimCol: Column): Column =
    struct(qsimCol.as("qsim"), idCol.as("id"),
      vecCol.cast("array<double>").as("vec"))

  /** Greedy MMR selection of `k` from the candidate frame (id, vec,
    * query-sim). `cand` MUST be retrieval-bounded (top-N): the fold
    * state is one row of N candidate structs. Output: (rank, id,
    * mmr_score), rank 1..k in selection order. */
  def diversify(cand: DataFrame, idCol: Column, vecCol: Column,
                qsimCol: Column, k: Int): DataFrame = {
    require(k >= 1, s"k=$k")
    val cs = cand
      .select(candStruct(idCol, vecCol, qsimCol).as("c"))
      .agg(sort_array(collect_list(col("c"))).as("cs"))
    cs.select(explode(greedyFold(col("cs"), k)).as("s"))
      .select(col("s.rank").as("rank"), col("s.id").as("id"),
        graft.functions.Rounding.floorRound6(col("s.score")).as("mmr_score"))
  }

  /** Batch-serving MMR: one greedy selection PER QUERY over that
    * query's retrieval-bounded candidates (the knn-join shape). One
    * groupBy on the query id is the only shuffle — each group's state
    * is its own ≤N-struct row, so query batches scale out by
    * partitioning on the query id with per-group work identical to the
    * single-query fold. Output: (qid, rank, id, mmr_score). */
  def diversifyGrouped(cand: DataFrame, qidCol: Column, idCol: Column,
                       vecCol: Column, qsimCol: Column, k: Int): DataFrame = {
    require(k >= 1, s"k=$k")
    val cs = cand
      .select(qidCol.as("qid"), candStruct(idCol, vecCol, qsimCol).as("c"))
      .groupBy(col("qid"))
      .agg(sort_array(collect_list(col("c"))).as("cs"))
    cs.select(col("qid"), explode(greedyFold(col("cs"), k)).as("s"))
      .select(col("qid"), col("s.rank").as("rank"), col("s.id").as("id"),
        graft.functions.Rounding.floorRound6(col("s.score")).as("mmr_score"))
  }
}
