package graft

import org.apache.spark.sql.SparkSession

/** Scratch per-query cost decomposition for the round-12 optimization
  * pass (not part of the driver contract): splits one query's rep into
  * construction+analysis, physical planning, first execution, and a
  * second execution in the same rep, with process-CPU alongside wall —
  * the wall numbers on this runner are steal-noisy, CPU is not. */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      // same shuffle-I/O session defaults as Bench/Verify — without
      // them this runner's transferTo/mmap pathology (OPTIMIZATION_r12)
      // storms the profile (observed: BypassMergeSortShuffleWriter
      // map0/unmap0 frames burning 100+ sys-CPU-s on 40k-row tasks)
      .config("spark.file.transferTo",
        sys.env.getOrElse("SPARK_GRAFT_TRANSFERTO", "false"))
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS_MERGE", "1"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    def cpuS(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime / 1e9
        case _ => -1.0
      }
    def span[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val c0 = cpuS()
      val r = f
      println(f"[pq] $tag%-42s wall=${(System.nanoTime() - t0) / 1e9}%8.3f cpu=${cpuS() - c0}%8.3f")
      r
    }
    for (name <- args; rep <- 1 to 3) {
      val fn = SparkEntry.queries(name)
      val df = span(s"$name#$rep construct+analyze")(fn(spark, sfDir))
      span(s"$name#$rep physical plan")(df.queryExecution.executedPlan)
      span(s"$name#$rep count 1")(df.count())
      span(s"$name#$rep count 2 (same frame)")(df.count())
    }
    spark.stop()
  }
}
