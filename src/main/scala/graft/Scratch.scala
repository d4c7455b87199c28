package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.HrPipeline

/** Scratch profiling main — not part of the driver contract. */
object Scratch {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // reference-corpus index build: 10k employees + 84 jobs from the
    // reference's own data file (extracted by ReferenceDataSpec)
    val json = "target/refdata/hr_data.json"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(json))) {
      println("[scratch] run ReferenceDataSpec first to extract hr_data.json")
      sys.exit(1)
    }
    val emps = HrPipeline.loadEmployees(spark, json)
    val jobs = HrPipeline.loadJobs(spark, json)
    time("ingest 10k")(println("rows: " + (emps.count() + jobs.count())))
    val out = java.nio.file.Files.createTempDirectory("graft-idx-").toString
    Seq(64, 384).foreach { dim =>
      time(s"index build+write dim=$dim") {
        HrPipeline.writeCollection(
          HrPipeline.collection(emps, jobs, embedDim = dim),
          s"$out/idx$dim", numFiles = 32)
      }
    }
    spark.stop()
  }
}
