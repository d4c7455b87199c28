package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.sources.HrPipeline

/** Reference-parity tests for the HR document pipeline, built on the
  * reference's own inline smoke fixtures (FIXTURES.md §A.3):
  *  - 2+2 minimal records from data_loader.py:62-71 (ingest semantics)
  *  - the full sample employee/job from embedding_utils.py:95-111 with the
  *    exact expected doc-text templates (embedding_utils.py:45-76)
  *  - metadata flattening rules from vector_db.py:29-42
  *  - recommend() filter/rank semantics from talent_recommender.py:70-150
  */
class HrPipelineSpec extends SparkSuite {
  import spark.implicits._

  // ---- fixture JSON (data_loader.py:62-71) ----------------------------

  private val integratedJson =
    """{
      |  "employees": [
      |    {"id": "EMP_TEST_001", "name": "김직원", "position": "개발자", "department": "개발팀"},
      |    {"id": "EMP_TEST_002", "name": "이직원", "position": "디자이너", "department": "디자인팀"}
      |  ],
      |  "job_descriptions": [
      |    {"id": "JOB_TEST_001", "title": "백엔드 개발자", "department": "개발팀", "required_skills": ["Java", "Spring"]},
      |    {"id": "JOB_TEST_002", "title": "UX 디자이너", "department": "디자인팀", "required_skills": ["Figma", "UX Research"]}
      |  ]
      |}""".stripMargin

  private def tempJson(content: String): String = {
    val p: Path = Files.createTempFile("graft-hr-", ".json")
    Files.write(p, content.getBytes(StandardCharsets.UTF_8))
    p.toFile.deleteOnExit()
    p.toString
  }

  test("ingest: loads both record lists from the integrated file") {
    val path = tempJson(integratedJson)
    val emps = HrPipeline.loadEmployees(spark, path)
    val jobs = HrPipeline.loadJobs(spark, path)
    assert(emps.count() === 2)
    assert(jobs.count() === 2)
    assert(emps.orderBy("id").select("name").as[String].collect()
      === Array("김직원", "이직원"))
    assert(jobs.orderBy("id").select("title").as[String].collect()
      === Array("백엔드 개발자", "UX 디자이너"))
  }

  test("ingest: missing file / bad JSON / missing key → empty, never error") {
    // data_loader.py:24-46 — every failure mode yields an empty list
    assert(HrPipeline.loadEmployees(spark, "/nonexistent/x.json").count() === 0)
    val bad = tempJson("{ this is not json ]")
    assert(HrPipeline.loadEmployees(spark, bad).count() === 0)
    val wrongKey = tempJson("""{"other_key": [{"id": "X1"}]}""")
    assert(HrPipeline.loadEmployees(spark, wrongKey).count() === 0)
    assert(HrPipeline.loadJobs(spark, wrongKey).count() === 0)
  }

  // ---- doc-text templates (embedding_utils.py:95-111 sample records) --

  private val sampleEmployee = Seq(
    ("EMP00001", "홍길동", "시니어 개발자", "R&D팀",
      Seq("Python", "Django", "AWS"),
      Seq("신규 서비스 개발", "레거시 시스템 개선"),
      ("컴퓨터공학 석사", "한국대학교", 2018),
      Seq("한국어(원어민)", "영어(업무 가능)"),
      "다양한 웹 서비스 개발 경험을 가진 개발자입니다."))
    .toDF("id", "name", "position", "department", "skills", "projects",
      "edu", "languages", "profile_summary")
    .select(col("*"), col("edu._1").as("degree"), col("edu._2").as("school"),
      col("edu._3").as("graduation_year"))
    .withColumn("education",
      struct(col("degree"), col("school"), col("graduation_year")))
    .drop("edu", "degree", "school", "graduation_year")

  test("employee doc text matches the reference template byte-for-byte") {
    // expected output of prepare_text_for_employee_embedding
    // (embedding_utils.py:45-51) on the sample at :95-101 — note the double
    // period after the profile (faithful to the reference's formatting)
    val expected =
      "직원 유형. 프로필: 다양한 웹 서비스 개발 경험을 가진 개발자입니다.. " +
        "직무: 시니어 개발자. 부서: R&D팀. 보유 기술: Python, Django, AWS. " +
        "수행 프로젝트: 신규 서비스 개발. 레거시 시스템 개선. " +
        "학력: 컴퓨터공학 석사 한국대학교 (2018). " +
        "사용 언어: 한국어(원어민), 영어(업무 가능)."
    val got = sampleEmployee.select(HrPipeline.employeeDocText.as("t"))
      .as[String].head()
    assert(got === expected)
  }

  test("job doc text matches the reference template byte-for-byte") {
    val sampleJob = Seq(
      ("JOB001", "풀스택 개발자", "IT 개발팀", "부산", "프리랜서",
        Seq("Firebase", "TypeScript", "Flask"), Seq("C#", "Flutter"),
        "5년 이상", "학사 이상",
        Seq("API 개발 아키텍처 분석", "인증 시스템 환경 표준화"),
        "IT 개발팀에서 함께할 5년 이상 풀스택 개발자을(를) 찾고 있습니다."))
      .toDF("id", "title", "department", "location", "employment_type",
        "required_skills", "preferred_skills", "experience_years",
        "education", "responsibilities", "description")
    val expected =
      "채용 공고 유형. 공고명: 풀스택 개발자. 부서: IT 개발팀. 근무지: 부산. " +
        "고용 형태: 프리랜서. 필수 기술: Firebase, TypeScript, Flask. " +
        "우대 기술: C#, Flutter. 경력: 5년 이상. 학력 조건: 학사 이상. " +
        "주요 업무: API 개발 아키텍처 분석. 인증 시스템 환경 표준화. " +
        "상세 설명: IT 개발팀에서 함께할 5년 이상 풀스택 개발자을(를) 찾고 있습니다.."
    val got = sampleJob.select(HrPipeline.jobDocText.as("t")).as[String].head()
    assert(got === expected)
  }

  test("doc text: missing fields default to empty / N/A (item.get semantics)") {
    // minimal record: everything but id absent (null) —
    // embedding_utils.py:39-43 defaults: '' for strings/lists, 'N/A' for year
    val minimal = spark.createDataFrame(
      java.util.List.of(Row("E1", null, null, null, null, null, null, null, null)),
      HrPipeline.employeeSchema.copy(fields = HrPipeline.employeeSchema.fields
        .filterNot(f => Set("certifications", "join_date").contains(f.name))))
    val got = minimal.select(HrPipeline.employeeDocText.as("t")).as[String].head()
    assert(got ===
      "직원 유형. 프로필: . 직무: . 부서: . 보유 기술: . 수행 프로젝트: . " +
        "학력:   (N/A). 사용 언어: .")
  }

  // ---- metadata flattening (vector_db.py:29-42) -----------------------

  test("metadata flattening: struct → education_* strings, lists → joined") {
    val flat = HrPipeline.flattenEmployeeMetadata(
      sampleEmployee
        .withColumn("join_date", lit("2020-01-01"))
        .withColumn("certifications", typedlit(Seq.empty[String])))
    val row = flat.head()
    assert(row.getAs[String]("education_degree") === "컴퓨터공학 석사")
    assert(row.getAs[String]("education_graduation_year") === "2018") // stringified
    assert(row.getAs[String]("skills") === "Python, Django, AWS")
    assert(row.getAs[String]("certifications") === "") // empty list → ""
    assert(row.getAs[String]("languages") === "한국어(원어민), 영어(업무 가능)")
  }

  // ---- collection build (vector_db.py:44-180) -------------------------

  private def fixtureCollection() = {
    val path = tempJson(integratedJson)
    HrPipeline.collection(
      HrPipeline.loadEmployees(spark, path),
      HrPipeline.loadJobs(spark, path), embedDim = 16)
  }

  test("collection: tagged union carries all rows with doc_type + embedding") {
    val coll = fixtureCollection()
    assert(coll.count() === 4)
    val types = coll.groupBy("doc_type").count().as[(String, Long)]
      .collect().toMap
    assert(types === Map("employee" -> 2L, "job" -> 2L))
    // every embedding is L2-normalized, dim 16
    val norms = coll.select(
      sqrt(aggregate(transform(col("embedding"), x => x.cast("double")),
        lit(0.0), (a, x) => a + x * x)).as("n")).as[Double].collect()
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-6))
    assert(coll.select(size(col("embedding"))).as[Int].head() === 16)
  }

  test("collection: invalid records dropped (null id, empty doc text)") {
    val nullableIdSchema = org.apache.spark.sql.types.StructType(
      HrPipeline.employeeSchema.fields.map(f =>
        if (f.name == "id") f.copy(nullable = true) else f))
    val emps = spark.createDataFrame(
      java.util.List.of(
        Row("E1", "가", "개발자", "개발팀", null, null, null, null, null, null, null),
        Row(null, "나", "디자이너", "디자인팀", null, null, null, null, null, null, null)),
      nullableIdSchema)
    val coll = HrPipeline.collection(emps, HrPipeline.loadJobs(spark, "/nope"))
    assert(coll.count() === 1) // null-id row dropped (vector_db.py:119-121)
    assert(coll.select("id").as[String].head() === "E1")
  }

  // ---- change detection (vector_db.py:81-107) -------------------------

  test("needsRebuild: true when missing or count-mismatched, false when equal") {
    val dir = Files.createTempDirectory("graft-idx-").toString
    val path = tempJson(integratedJson)
    val emps = HrPipeline.loadEmployees(spark, path)
    val jobs = HrPipeline.loadJobs(spark, path)
    assert(HrPipeline.needsRebuild(spark, s"$dir/idx", emps, jobs)) // no index
    HrPipeline.writeCollection(
      HrPipeline.collection(emps, jobs, embedDim = 8), s"$dir/idx", numFiles = 2)
    assert(!HrPipeline.needsRebuild(spark, s"$dir/idx", emps, jobs)) // in sync
    assert(HrPipeline.needsRebuild(spark, s"$dir/idx", emps.limit(1), jobs))
  }

  // ---- recommend (talent_recommender.py:70-150) -----------------------

  /** Hand-built 4-row collection with controlled embeddings: e1 is nearest
    * the query, then e2, then j1, then j2. */
  private def handColl() = {
    def vec(x: Double, y: Double) = Seq(x.toFloat, y.toFloat)
    Seq(
      ("E1", "employee", "개발팀", "Python 프로젝트 진행", "한국어(원어민), 영어(중급)", null.asInstanceOf[String], null.asInstanceOf[String], "김일", vec(1.0, 0.0)),
      ("E2", "employee", "디자인팀", "Figma 디자인 시스템", "한국어(원어민)", null.asInstanceOf[String], null.asInstanceOf[String], "김이", vec(0.9, 0.1)),
      ("J1", "job", "개발팀", null.asInstanceOf[String], null.asInstanceOf[String], "백엔드 python 서비스 운영", "Django 경험", "백엔드 개발자", vec(0.5, 0.5)),
      ("J2", "job", "디자인팀", null.asInstanceOf[String], null.asInstanceOf[String], "프로덕트 디자인", "UX 중심", "디자이너", vec(0.0, 1.0)))
      .toDF("id", "doc_type", "department", "projects", "languages",
        "responsibilities", "description", "nm", "embedding")
      .withColumn("name",
        when(col("doc_type") === "employee", col("nm")))
      .withColumn("title",
        when(col("doc_type") === "job", col("nm")))
      .drop("nm")
  }

  test("recommend: distance ranking with doc_type pre-filter") {
    val out = HrPipeline.recommend(handColl(), "추천", Seq(1.0, 0.0), k = 2,
      targetDocType = Some("employee"))
    val ids = out.select("id").as[String].collect()
    assert(ids === Array("E1", "E2")) // nearest employees, jobs excluded
  }

  test("recommend: department filter is case-insensitive equality") {
    val out = HrPipeline.recommend(handColl(), "추천", Seq(1.0, 0.0), k = 4,
      departmentFilter = Some("개발팀"))
    assert(out.select("id").as[String].collect().toSet === Set("E1", "J1"))
  }

  test("recommend: keyword matches outrank closer non-matches") {
    // "python" (len>2, lowercased) appears in E1.projects and
    // J1.responsibilities‖description; E2 is nearer than J1 but has no match
    val out = HrPipeline.recommend(handColl(), "python 전문가", Seq(1.0, 0.0), k = 4)
    val rows = out.select("id", "match_count").as[(String, Int)].collect()
    assert(rows.map(_._1).take(2) === Array("E1", "J1")) // match_count=1 first
    assert(rows.map(_._1).drop(2) === Array("E2", "J2")) // then by distance
  }

  test("recommend: language AND-filter drops employees, passes jobs") {
    // requires 영어 AND 일본어 — E1 has only 영어, E2 neither; jobs exempt
    // (talent_recommender.py:122-145)
    val out = HrPipeline.recommend(handColl(), "추천", Seq(1.0, 0.0), k = 4,
      requiredLanguages = Seq("영어", "일본어"))
    val ids = out.select("id").as[String].collect().toSet
    assert(ids === Set("J1", "J2"))
    // single language 영어: E1 passes ("영어(중급)" contains "영어"), E2 not
    val out2 = HrPipeline.recommend(handColl(), "추천", Seq(1.0, 0.0), k = 4,
      requiredLanguages = Seq("영어"))
    assert(out2.select("id").as[String].collect().toSet === Set("E1", "J1", "J2"))
  }

  test("recommend: similarity = 1 - distance (main.py:118)") {
    val out = HrPipeline.recommend(handColl(), "추천", Seq(1.0, 0.0), k = 1)
    val r = out.select("dist", "similarity").as[(Double, Double)].head()
    assert(math.abs((1.0 - r._1) - r._2) < 1e-6)
  }

  test("recommend: overfetch truncates before filtering (reference parity)") {
    // exactMode=false overfetches max(5k,20) THEN filters — with k=1 the
    // overfetch is 20 > |coll|, so no recall loss here; exactMode=true must
    // agree on this small fixture
    val a = HrPipeline.recommend(handColl(), "추천", Seq(1.0, 0.0), k = 2,
      departmentFilter = Some("디자인팀"), exactMode = false)
    val b = HrPipeline.recommend(handColl(), "추천", Seq(1.0, 0.0), k = 2,
      departmentFilter = Some("디자인팀"), exactMode = true)
    assert(a.select("id").as[String].collect().toSeq
      === b.select("id").as[String].collect().toSeq)
  }
}
