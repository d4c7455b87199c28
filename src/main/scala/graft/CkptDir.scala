package graft
import org.apache.spark.sql.SparkSession

/** Reliable-checkpoint directory lifecycle shared by the Bench/Verify
  * mains: create a temp dir, point `sparkContext.setCheckpointDir` at it
  * (the iterative operators — Dedup connected components — prefer
  * serialized-to-disk reliable checkpoints over deserialized in-heap
  * localCheckpoint caching, which OOM'd a 64 GB driver on the sf10
  * soak's ~50M-edge pair graph; it is also the cluster-correct
  * configuration, surviving executor loss), and DELETE it on JVM exit.
  * Reliable checkpoint RDD files are not cleaned up by default, so
  * without the hook repeated runs accumulate corpus-sized checkpoint
  * data in /tmp (ADVICE round 9). */
object CkptDir {
  def init(spark: SparkSession): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    // (spark.cleaner.referenceTracking.cleanCheckpoints is a static core
    // conf — not settable on a built session — so the exit hook is the
    // whole cleanup story here)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(dir.toFile)
    }))
  }
}
