package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection with a database-friendly
  * ±1 matrix (Achlioptas 2003, JCSS — sign matrices preserve pairwise
  * distances in expectation like Gaussian ones at a fraction of the
  * cost): y_j = Σ_i s_ij·x_i with s_ij ∈ {+1, −1}. The reduced sketch
  * feeds cheap ANN / near-dup passes beside the matryoshka-prefix,
  * SQ8, PQ and binary tiers — unlike the matryoshka prefix it needs
  * NO model cooperation, and unlike the sign sketch it keeps a real
  * Euclidean geometry (distances, not Hamming).
  *
  * Determinism/oracle contract: s_ij is the PARITY of the first 16
  * md5 bits of "jl:j:i" (the tokenHash16 convention, replayed in SQL
  * by hash16Sql % 2), materialized at plan-build time into one
  * left-associated ±element_at chain per output dim — pure codegen
  * arithmetic, no HOF, no UDF; the left-assoc chain is bit-equal to
  * DuckDB's first-element-seeded list_reduce over the i-ordered term
  * list. The 1/√m variance normalization is deliberately OMITTED
  * (irrational — never hash-matchable; it rescales every distance by
  * the same factor, so ranking geometry is unchanged).
  *
  * Scale shape: entirely map-side — m fused ±-chains over the vector
  * column inside one projection, then one generator to long form. No
  * shuffle, no state; 100 TB cost is the scan.
  */
object RandomProjection {

  /** The deterministic ±1.0 sign for output dim `j`, input dim `i`. */
  def sign(j: Int, i: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"jl:$j:$i".getBytes("UTF-8"))
    val h16 = ((md(0) & 0xff) << 8) | (md(1) & 0xff)
    if (h16 % 2 == 0) 1.0 else -1.0
  }

  /** Project `vecCol` (length `d`) to `m` dims; long output
    * `(id, j INT, y DOUBLE)`, y floor-rounded at 6 digits. Rides the
    * native [[graft.plans.JlProjectExpr]] kernel: the declarative
    * m·(2d−1)-node ±chain projection was plan-size-bound — its
    * analysis/optimizer/codegen cost dominated the query at every SF
    * (kept as [[projectChained]], parity-asserted in
    * RandomProjectionSpec).
    *
    * INPUT CONTRACT (the kernel and the chained reference diverge
    * outside it — ADVICE r15): `vecCol` must be NON-NULL with at least
    * `d` elements. A NULL vector emits 0 rows (null-intolerant kernel
    * expression under posexplode), where the ±element_at chain emitted
    * m rows with null y; a shorter-than-`d` vector throws
    * (`JlProjectExpr.compute` requires length ≥ d), where the chain
    * returned null y under non-ANSI element_at. The kernel behavior is
    * the deliberate one — a missing/truncated embedding should drop or
    * fail loudly, not fabricate m null sketch rows; both degenerate
    * behaviors are pinned in RandomProjectionSpec. */
  def project(df: DataFrame, idCol: Column, vecCol: Column,
              d: Int, m: Int): DataFrame = {
    require(d >= 1 && m >= 1, s"need d, m >= 1; got d=$d m=$m")
    df.select(idCol.as("id"),
        posexplode(graft.plans.JlProjectExpr.jlProject(vecCol, d, m))
          .as(Seq("j", "y")))
      .select(col("id"), col("j"),
        graft.functions.Rounding.floorRound6(col("y")).as("y"))
  }

  /** The former declarative ±element_at chain formulation — kept as
    * the reference the native kernel is parity-tested against (the
    * HashedShingles contract pattern); not on any declared query
    * path. */
  private[graft] def projectChained(df: DataFrame, idCol: Column,
              vecCol: Column, d: Int, m: Int): DataFrame = {
    require(d >= 1 && m >= 1, s"need d, m >= 1; got d=$d m=$m")
    def term(j: Int, i: Int): Column = {
      val x = element_at(vecCol, i + 1).cast("double")
      if (sign(j, i) > 0) x else -x
    }
    val ys = (0 until m).map { j =>
      (1 until d).foldLeft(term(j, 0))((acc, i) => acc + term(j, i))
    }
    df.select(idCol.as("id"),
        posexplode(array(ys: _*)).as(Seq("j", "y")))
      .select(col("id"), col("j"),
        graft.functions.Rounding.floorRound6(col("y")).as("y"))
  }
}
