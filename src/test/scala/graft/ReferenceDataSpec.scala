package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.zip.ZipFile

import org.apache.spark.sql.functions._

import graft.sources.HrPipeline

/** End-to-end integration against the reference's OWN dataset
  * (`data/hr_data.json` inside `/root/reference/vectordb-hr-data.zip`:
  * 10,000 employees + 84 job postings, 11.8 MB). Extracted read-only into
  * the gitignored `target/` dir. This is the closest available stand-in
  * for running the reference itself: same input file, same ingest
  * semantics, full collection build at the reference's corpus size
  * (BASELINE.md: 10,000 indexed elements). */
class ReferenceDataSpec extends SparkSuite {
  import spark.implicits._

  private lazy val jsonPath: String = {
    val out = Paths.get("target/refdata/hr_data.json")
    if (!Files.exists(out)) {
      Files.createDirectories(out.getParent)
      val zip = new ZipFile("/root/reference/vectordb-hr-data.zip")
      try {
        val entry = zip.getEntry("data/hr_data.json")
        val in = zip.getInputStream(entry)
        try Files.copy(in, out, StandardCopyOption.REPLACE_EXISTING)
        finally in.close()
      } finally zip.close()
    }
    out.toString
  }

  private lazy val employees = HrPipeline.loadEmployees(spark, jsonPath)
  private lazy val jobs = HrPipeline.loadJobs(spark, jsonPath)

  test("ingest: full corpus loads with the documented cardinalities") {
    assert(employees.count() === 10000)
    assert(jobs.count() === 84)
    // ids unique (vector_db.py:75-79 relies on it)
    assert(employees.select("id").distinct().count() === 10000)
    assert(jobs.select("id").distinct().count() === 84)
  }

  test("doc text follows the reference template on every record") {
    val emp = employees.select(HrPipeline.employeeDocText.as("t"))
    assert(emp.filter(!col("t").startsWith("직원 유형. 프로필: ")).count() === 0)
    assert(emp.filter(!col("t").contains(". 보유 기술: ")).count() === 0)
    val job = jobs.select(HrPipeline.jobDocText.as("t"))
    assert(job.filter(!col("t").startsWith("채용 공고 유형. 공고명: "))
      .count() === 0)
    // education_graduation_year always present in the data → no N/A fallback
    assert(emp.filter(col("t").contains("(N/A)")).count() === 0)
  }

  test("collection build at reference corpus size: 10,084 embedded docs") {
    val coll = HrPipeline.collection(employees, jobs, embedDim = 16)
    val byType = coll.groupBy("doc_type").count()
      .as[(String, Long)].collect().toMap
    assert(byType === Map("employee" -> 10000L, "job" -> 84L))
    // metadata got flattened: every column scalar, no arrays/structs left
    assert(coll.schema.fields.forall(f => f.name == "embedding" ||
      !f.dataType.typeName.matches("array|struct")))
  }

  test("index write + change detection roundtrip at full size") {
    val dir = Files.createTempDirectory("graft-ref-idx-").toString
    val coll = HrPipeline.collection(employees, jobs, embedDim = 16)
    HrPipeline.writeCollection(coll, s"$dir/idx", numFiles = 8)
    assert(spark.read.parquet(s"$dir/idx").count() === 10084)
    assert(!HrPipeline.needsRebuild(spark, s"$dir/idx", employees, jobs))
    // dropping records triggers a rebuild (vector_db.py:81-94)
    assert(HrPipeline.needsRebuild(spark, s"$dir/idx",
      employees.limit(9000), jobs))
  }

  test("batched encoder seam: full corpus, 5000-doc batches, bit parity") {
    // the vector_db.py:146-175 analogue end-to-end: 10,084 real docs
    // through the pluggable batched encoder at the reference's batch size
    // (5000, config.py:24), default feature-hash kernel → must be
    // bit-identical to the in-plan expression pipeline
    // collection() stores ARRAY<FLOAT> (the storage type); the seam emits
    // the raw doubles — compare at the common storage precision
    val viaSeam = HrPipeline.collectionEncoded(employees, jobs,
        new graft.operators.BatchEncode.FeatureHashEncoder(16),
        batchSize = 5000)
      .select(col("id"), col("doc_type"),
        col("embedding").cast("array<float>").as("embedding"))
    val viaExpr = HrPipeline.collection(employees, jobs, embedDim = 16)
      .select(col("id"), col("doc_type"),
        col("embedding").cast("array<float>").as("embedding"))
    assert(viaSeam.count() === 10084)
    assert(viaSeam.exceptAll(viaExpr).count() === 0)
    assert(viaExpr.exceptAll(viaSeam).count() === 0)
  }

  test("recommend over the real corpus: filters + ranking behave") {
    val coll = HrPipeline.collection(employees, jobs, embedDim = 16)
    val q = "Python 백엔드 개발 경험"
    val qVec = coll.filter(col("id") === "EMP00001")
      .select(col("embedding").cast("array<double>"))
      .as[Seq[Double]].head()
    val out = HrPipeline.recommend(coll, q, qVec, k = 5,
      targetDocType = Some("employee"), exactMode = true).collect()
    assert(out.length === 5)
    assert(out.forall(_.getAs[String]("doc_type") == "employee"))
    // distances ascending within equal match_count
    val dists = out.map(r => (r.getAs[Int]("match_count"),
      r.getAs[Double]("dist")))
    assert(dists.sliding(2).forall {
      case Array((m1, d1), (m2, d2)) => m1 > m2 || (m1 == m2 && d1 <= d2)
      case _ => true
    })
    // department filter restricts results to that department
    val dept = HrPipeline.recommend(coll, q, qVec, k = 5,
      departmentFilter = Some("IT 개발팀"), exactMode = true).collect()
    assert(dept.nonEmpty)
    assert(dept.forall(_.getAs[String]("department") == "IT 개발팀"))
  }
}
