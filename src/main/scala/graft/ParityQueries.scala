package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Knn

/** Reference-parity queries — one per operator in SURVEY.md §2.
  *
  * Each key has a DuckDB oracle in [[oracles]]. Determinism rules (SURVEY
  * §2.8): explicit unique-key tiebreaks in every ORDER BY, DOUBLE-cast
  * element-wise vector math with round(,6), DECIMAL(18,4) intermediate sums
  * cast back to DOUBLE, no timestamps in output columns (cast to epoch/string
  * where needed).
  *
  * The `documents` / `embeddings` tables play the reference's HR corpus and
  * embedded collection (FIXTURES.md §B): doc_id≈id, lang/source≈metadata
  * columns, `label` ≈ the `doc_type` categorical, query vector = row
  * `vec_id = 0`.
  */
object ParityQueries {

  private type Q = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)
  private def emb(s: SparkSession, d: String)  = Tables.embeddings(s, d)
  private def evs(s: SparkSession, d: String)  = Tables.events(s, d)

  /** Query vector (vec_id=0) as a driver-side literal — 1-row pushed-down
    * lookup, the Spark analogue of embedding the query text on the driver. */
  private def queryVec(s: SparkSession, d: String): Seq[Double] =
    Knn.vectorAt(emb(s, d), col("vec_id"), 0L, col("embedding"))

  // Keywords guaranteed present in the synthetic corpus vocabulary.
  private val kw: Seq[String] = Seq("join", "filter", "window", "scan")

  private def keywordCount(text: Column): Column =
    size(filter(typedlit(kw), t => text.contains(t)))

  val all: Map[String, Q] = Map(
    // ---- S1: JSON scan (data_loader.py:15-49) — JSON parse path via
    // to_json/from_json roundtrip (driver testdata is parquet-only).
    "q_scan_json" -> ((s, d) => {
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("lang", StringType),
        StructField("n_chars", LongType)))
      docs(s, d)
        .select(to_json(struct(col("doc_id"), col("lang"), col("n_chars"))).as("js"))
        .select(from_json(col("js"), schema).as("r"))
        .select(col("r.doc_id").as("doc_id"), col("r.lang").as("lang"),
          col("r.n_chars").as("n_chars"))
        .orderBy("doc_id")
    }),

    // ---- S2: persisted-collection read (main.py:40-41)
    "q_scan_parquet" -> ((s, d) =>
      emb(s, d).select(col("vec_id"), col("label")).orderBy("vec_id")),

    // ---- S4: count (main.py:68)
    "q_count" -> ((s, d) => docs(s, d).agg(count(lit(1)).as("n"))),

    // ---- P1: field extraction with default (embedding_utils.py:31-76)
    // json_tuple: ONE parse per row emitting both fields — two
    // get_json_object calls would each re-parse the JSON string per row
    // (measured 7.2s on the sf0.1 bench, the round-1 worst query). A
    // multi-referenced from_json is no fix: OptimizeCsvJsonExprs splits it
    // back into per-field parses.
    "q_project_default" -> ((s, d) =>
      evs(s, d)
        .select(col("event_id"),
          json_tuple(col("props"), "k", "missing").as(Seq("_k", "_m")))
        .select(
          col("event_id"),
          coalesce(col("_k"), lit("")).as("k_val"),
          coalesce(col("_m"), lit("")).as("m_val"))
        .orderBy("event_id")),

    // ---- P2: array→string join (embedding_utils.py:40-42)
    "q_array_join" -> ((s, d) =>
      docs(s, d).select(
        col("doc_id"),
        array_join(filter(split(col("text"), "\\s+"), t => t =!= ""), ", ")
          .as("joined"))
        .orderBy("doc_id")),

    // ---- P3: string template concat (embedding_utils.py:45-76)
    "q_concat_template" -> ((s, d) =>
      docs(s, d).select(
        col("doc_id"),
        concat(lit("문서 "), col("doc_id").cast("string"), lit(" ["),
          col("lang"), lit("] 출처: "), col("source")).as("doc_text"))
        .orderBy("doc_id")),

    // ---- P4+P5: struct flatten + stringify (vector_db.py:29-42)
    "q_struct_flatten" -> ((s, d) =>
      docs(s, d)
        .select(col("doc_id"),
          struct(col("lang"), col("source"), col("n_chars")).as("meta"))
        .select(col("doc_id"),
          col("meta.lang").cast("string").as("meta_lang"),
          col("meta.source").cast("string").as("meta_source"),
          col("meta.n_chars").cast("string").as("meta_n_chars"))
        .orderBy("doc_id")),

    // ---- P6: validity filter (vector_db.py:119-131)
    "q_filter_notnull" -> ((s, d) =>
      docs(s, d)
        .filter(col("doc_id").isNotNull && length(col("text")) > 0)
        .select(col("doc_id"), col("n_chars")).orderBy("doc_id")),

    // ---- P7: case-insensitive equality filter (talent_recommender.py:98-105)
    "q_filter_ci_eq" -> ((s, d) =>
      docs(s, d)
        .filter(lower(col("source")) === lower(lit("SRC3")))
        .select(col("doc_id"), col("source")).orderBy("doc_id")),

    // ---- P8: categorical pre-filter, pushed to scan (talent_recommender.py:31-67)
    "q_filter_categorical" -> ((s, d) =>
      docs(s, d).filter(col("lang") === "en")
        .select(col("doc_id"), col("lang"), col("source")).orderBy("doc_id")),

    // ---- P9: tokenize + stop-short (talent_recommender.py:108)
    "q_tokenize" -> ((s, d) =>
      docs(s, d).select(
        col("doc_id"),
        array_join(
          filter(split(lower(col("text")), "\\s+"), t => length(t) > 2),
          " ").as("toks"))
        .orderBy("doc_id")),

    // ---- P10: substring-match keyword count (talent_recommender.py:108-119)
    "q_keyword_count" -> ((s, d) =>
      docs(s, d).select(col("doc_id"),
        keywordCount(col("text")).as("match_count"))
        .orderBy("doc_id")),

    // ---- P11: multi-value AND substring filter (talent_recommender.py:122-145)
    "q_forall_contains" -> ((s, d) =>
      docs(s, d)
        .filter(forall(typedlit(Seq("data", "the")),
          t => lower(col("text")).contains(lower(t))))
        .select(col("doc_id"), col("lang")).orderBy("doc_id")),

    // ---- P12: conditional field mapping (talent_recommender.py:70-94)
    "q_when_otherwise" -> ((s, d) =>
      docs(s, d).select(col("doc_id"),
        when(col("lang") === "en", col("source")).otherwise(col("lang"))
          .as("tag"))
        .orderBy("doc_id")),

    // ---- P13: score transform, similarity = 1 − distance (main.py:118)
    "q_score_transform" -> ((s, d) => {
      val q = queryVec(s, d)
      Knn.knnExact(emb(s, d), col("embedding"), q, k = 10)
        .select(col("vec_id"), col("dist"),
          round(lit(1.0) - col("dist"), 6).as("similarity"))
        .orderBy("dist", "vec_id")
    }),

    // ---- V2: exact brute-force kNN (talent_recommender.py:26-59)
    "q_knn_bruteforce" -> ((s, d) => {
      val q = queryVec(s, d)
      Knn.knnExact(emb(s, d), col("embedding"), q, k = 10)
        .select(col("vec_id"), col("label"), col("dist"))
    }),

    // ---- V5: filtered kNN (talent_recommender.py:31-42)
    "q_knn_filtered" -> ((s, d) => {
      val q = queryVec(s, d)
      Knn.knnExact(emb(s, d), col("embedding"), q, k = 10,
          preFilter = Some(col("label") === 3))
        .select(col("vec_id"), col("label"), col("dist"))
    }),

    // ---- R1+R2+P14: composite rank — (match_count DESC, dist ASC, id ASC)
    // then top-k (talent_recommender.py:148-150)
    "q_rank_composite" -> ((s, d) => {
      val q = queryVec(s, d)
      val cand = Knn.knnExact(emb(s, d), col("embedding"), q, k = 50)
      cand.join(docs(s, d), cand("vec_id") === col("doc_id"))
        .select(col("vec_id"), col("dist"),
          keywordCount(col("text")).as("match_count"))
        .orderBy(col("match_count").desc, col("dist").asc, col("vec_id").asc)
        .limit(10)
    }),

    // ---- U1: tagged union of heterogeneous schemas (vector_db.py:56-60)
    "q_union_tagged" -> ((s, d) => {
      val a = docs(s, d).select(col("doc_id").as("id"), col("text").as("payload"),
        col("lang")).withColumn("doc_type", lit("document"))
      val b = evs(s, d).select(col("event_id").as("id"),
        col("event_type").as("payload"), col("value"))
        .withColumn("doc_type", lit("event"))
      a.unionByName(b, allowMissingColumns = true)
        .orderBy("doc_type", "id")
    }),

    // ---- U2: distinct id set size (vector_db.py:75-79)
    "q_distinct_count" -> ((s, d) => {
      val ids = docs(s, d).select(col("doc_id").as("id"))
        .unionByName(evs(s, d).select(col("event_id").as("id")))
      ids.agg(countDistinct(col("id")).as("n_ids"))
    }),

    // ---- E2E via the ACTUAL HrPipeline.recommend() function (not a
    // hand-built equivalent): documents⋈embeddings mapped onto the HR
    // collection schema, then the reference pipeline — doc_type
    // pre-filter, overfetch-25 by (dist, id), ci department filter,
    // keyword scoring, composite rank, top-5 (talent_recommender.py:26-150).
    "q_hr_recommend" -> ((s, d) => {
      val coll = docs(s, d)
        .join(emb(s, d), col("doc_id") === col("vec_id"))
        .select(
          col("doc_id").cast("string").as("id"),
          when(col("lang") === "en", "employee").otherwise("job")
            .as("doc_type"),
          concat(lit("doc_"), col("doc_id").cast("string")).as("name"),
          concat(lit("post_"), col("doc_id").cast("string")).as("title"),
          col("source").as("department"),
          col("text").as("projects"),
          col("text").as("responsibilities"),
          col("source").as("description"),
          col("embedding"))
      graft.sources.HrPipeline.recommend(coll, "filter join window",
        queryVec(s, d), k = 10, departmentFilter = Some("SRC3"),
        targetDocType = Some("employee"))
    }),

    // ---- E2E: the reference's full query pipeline, overfetch-then-filter
    // order preserved (talent_recommender.py:26-150; overfetch :28).
    "q_pipeline_e2e" -> ((s, d) => {
      val k = 5
      val q = queryVec(s, d)
      // pre-filter (P8 analogue: label-class of the query row's corpus)
      // then ANN overfetch N = max(5k, 20)
      val cand = Knn.knnExact(emb(s, d), col("embedding"), q,
        k = Knn.overfetch(k), preFilter = Some(col("label") =!= 9))
      // candidate projection + keyword scoring + AND-filter, THEN rank
      cand.join(docs(s, d), cand("vec_id") === col("doc_id"))
        .select(col("vec_id"), col("dist"), col("lang"), col("source"),
          keywordCount(col("text")).as("match_count"),
          round(lit(1.0) - col("dist"), 6).as("similarity"))
        .filter(col("lang") =!= "zh")
        .orderBy(col("match_count").desc, col("dist").asc, col("vec_id").asc)
        .limit(k)
    })
  )

  // DuckDB equivalents. The driver registers each parquet as a view named
  // after the table. `list_transform(generate_series(...))` is the DuckDB
  // spelling of Spark's zip_with/aggregate fold; both sides cast elements to
  // DOUBLE first and round distances to 6 (SURVEY §2.8).
  private val l2DistSql =
    """round(sqrt(list_sum(list_transform(generate_series(1, len(e.embedding)),
      |  i -> (e.embedding[i]::DOUBLE - q.qv[i]::DOUBLE)
      |     * (e.embedding[i]::DOUBLE - q.qv[i]::DOUBLE)))), 6)""".stripMargin

  private val qvCte =
    "q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)"

  private val kwSql = "['join', 'filter', 'window', 'scan']"

  val oracles: Map[String, String] = Map(
    "q_scan_json" ->
      "SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id",

    "q_scan_parquet" ->
      "SELECT vec_id, label FROM embeddings ORDER BY vec_id",

    "q_count" -> "SELECT count(*) AS n FROM documents",

    "q_project_default" ->
      """SELECT event_id,
        |  coalesce(json_extract_string(props, '$.k'), '') AS k_val,
        |  coalesce(json_extract_string(props, '$.missing'), '') AS m_val
        |FROM events ORDER BY event_id""".stripMargin,

    "q_array_join" ->
      """SELECT doc_id,
        |  array_to_string(list_filter(string_split_regex(text, '\s+'),
        |    t -> t != ''), ', ') AS joined
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_concat_template" ->
      """SELECT doc_id,
        |  '문서 ' || doc_id::VARCHAR || ' [' || lang || '] 출처: ' || source
        |    AS doc_text
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_struct_flatten" ->
      """SELECT doc_id, lang::VARCHAR AS meta_lang,
        |  source::VARCHAR AS meta_source, n_chars::VARCHAR AS meta_n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_filter_notnull" ->
      """SELECT doc_id, n_chars FROM documents
        |WHERE doc_id IS NOT NULL AND length(text) > 0
        |ORDER BY doc_id""".stripMargin,

    "q_filter_ci_eq" ->
      """SELECT doc_id, source FROM documents
        |WHERE lower(source) = lower('SRC3') ORDER BY doc_id""".stripMargin,

    "q_filter_categorical" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE lang = 'en' ORDER BY doc_id""".stripMargin,

    "q_tokenize" ->
      """SELECT doc_id,
        |  array_to_string(list_filter(string_split_regex(lower(text), '\s+'),
        |    t -> len(t) > 2), ' ') AS toks
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_keyword_count" ->
      s"""SELECT doc_id,
         |  len(list_filter($kwSql, t -> contains(text, t))) AS match_count
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q_forall_contains" ->
      """SELECT doc_id, lang FROM documents
        |WHERE len(list_filter(['data', 'the'],
        |  t -> contains(lower(text), lower(t)))) = 2
        |ORDER BY doc_id""".stripMargin,

    "q_when_otherwise" ->
      """SELECT doc_id,
        |  CASE WHEN lang = 'en' THEN source ELSE lang END AS tag
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_score_transform" ->
      s"""WITH $qvCte
         |SELECT e.vec_id, $l2DistSql AS dist,
         |  round(1.0 - $l2DistSql, 6) AS similarity
         |FROM embeddings e, q
         |ORDER BY dist, vec_id LIMIT 10""".stripMargin,

    "q_knn_bruteforce" ->
      s"""WITH $qvCte
         |SELECT e.vec_id, e.label, $l2DistSql AS dist
         |FROM embeddings e, q
         |ORDER BY dist, vec_id LIMIT 10""".stripMargin,

    "q_knn_filtered" ->
      s"""WITH $qvCte
         |SELECT e.vec_id, e.label, $l2DistSql AS dist
         |FROM embeddings e, q
         |WHERE e.label = 3
         |ORDER BY dist, vec_id LIMIT 10""".stripMargin,

    "q_rank_composite" ->
      s"""WITH $qvCte,
         |cand AS (
         |  SELECT e.vec_id, $l2DistSql AS dist
         |  FROM embeddings e, q
         |  ORDER BY dist, vec_id LIMIT 50)
         |SELECT c.vec_id, c.dist,
         |  len(list_filter($kwSql, t -> contains(d.text, t))) AS match_count
         |FROM cand c JOIN documents d ON c.vec_id = d.doc_id
         |ORDER BY match_count DESC, dist ASC, vec_id ASC LIMIT 10""".stripMargin,

    "q_union_tagged" ->
      """SELECT * FROM (
        |  SELECT doc_id AS id, text AS payload, lang,
        |         'document' AS doc_type FROM documents
        |  UNION ALL BY NAME
        |  SELECT event_id AS id, event_type AS payload, value,
        |         'event' AS doc_type FROM events)
        |ORDER BY doc_type, id""".stripMargin,

    "q_distinct_count" ->
      """SELECT count(DISTINCT id) AS n_ids FROM (
        |  SELECT doc_id AS id FROM documents
        |  UNION ALL SELECT event_id AS id FROM events)""".stripMargin,

    "q_hr_recommend" ->
      s"""WITH $qvCte,
         |coll AS (
         |  SELECT d.doc_id::VARCHAR AS id,
         |    CASE WHEN d.lang = 'en' THEN 'employee' ELSE 'job' END
         |      AS doc_type,
         |    'doc_' || d.doc_id::VARCHAR AS name,
         |    d.source AS department, d.text AS projects,
         |    e.embedding AS embedding
         |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
         |cand AS (
         |  SELECT c.id, c.doc_type, c.name, c.department, c.projects,
         |    round(sqrt(list_sum(list_transform(
         |      generate_series(1, len(c.embedding)),
         |      i -> (c.embedding[i]::DOUBLE - q.qv[i]::DOUBLE)
         |         * (c.embedding[i]::DOUBLE - q.qv[i]::DOUBLE)))), 6) AS dist
         |  FROM coll c, q
         |  WHERE c.doc_type = 'employee'
         |  ORDER BY dist, id LIMIT 50),
         |flt AS (
         |  SELECT * FROM cand WHERE lower(department) = lower('SRC3')),
         |sc AS (
         |  SELECT *, len(list_filter(['filter', 'join', 'window'],
         |    t -> contains(lower(projects), t))) AS matched_keywords
         |  FROM flt)
         |SELECT id, doc_type, name AS name_or_title, department, dist,
         |  (1 + CASE WHEN matched_keywords > 0 THEN 1 ELSE 0 END)
         |    AS match_count,
         |  round(1.0 - dist, 6) AS similarity
         |FROM sc
         |ORDER BY match_count DESC, dist ASC, id ASC LIMIT 10""".stripMargin,

    "q_pipeline_e2e" ->
      s"""WITH $qvCte,
         |cand AS (
         |  SELECT e.vec_id, $l2DistSql AS dist
         |  FROM embeddings e, q
         |  WHERE e.label != 9
         |  ORDER BY dist, vec_id LIMIT 25)
         |SELECT c.vec_id, c.dist, d.lang, d.source,
         |  len(list_filter($kwSql, t -> contains(d.text, t))) AS match_count,
         |  round(1.0 - c.dist, 6) AS similarity
         |FROM cand c JOIN documents d ON c.vec_id = d.doc_id
         |WHERE d.lang != 'zh'
         |ORDER BY match_count DESC, dist ASC, vec_id ASC LIMIT 5""".stripMargin
  )
}
