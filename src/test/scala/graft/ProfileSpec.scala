package graft

import graft.operators.Profile

/** One-pass profiling semantics: null counting, distinct cardinality,
  * string-surfaced extrema, one output row per column. */
class ProfileSpec extends SparkSuite {
  import spark.implicits._

  test("profile: nulls, distincts, extrema in one pass") {
    val df = Seq(
      (1L, Some("en"), 10),
      (2L, None, 20),
      (3L, Some("ko"), 20),
      (4L, Some("en"), 30))
      .toDF("id", "lang", "n")
    val out = Profile.profile(df, Seq("id", "lang", "n"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5)))).toMap
    assert(out("id") === ((4L, 4L, 4L, "1", "4")))
    assert(out("lang") === ((4L, 3L, 2L, "en", "ko"))) // null excluded
    assert(out("n") === ((4L, 4L, 3L, "10", "30")))
    assert(out.size === 3)
  }
}
