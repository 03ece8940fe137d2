package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Round-12 deliverable helper: writes `.explain("formatted")` output
  * for the named queries to `<SPARK_GRAFT_PLAN_DIR>/<query><suffix>.txt`
  * (suffix from SPARK_GRAFT_PLAN_SUFFIX, e.g. `_before` / `_after`).
  * Runs each query once first so plans reflect the session's cached
  * fixture forms, exactly like the bench's steady state. */
object PlanDumpF {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "/root/repo/plans/r12")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "_after")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.debug.maxToStringFields", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    for (name <- args) {
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.count() // build fixtures / persists so the plan is the steady-state one
        val txt = df.queryExecution.explainString(FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/$name$suffix.txt"), txt)
        println(s"[plandump] $name$suffix ok (${txt.length} chars)")
      } catch { case e: Throwable =>
        println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
