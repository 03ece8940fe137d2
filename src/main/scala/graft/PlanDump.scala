package graft
import org.apache.spark.sql.SparkSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (name <- args) {
      println(s"===== $name =====")
      val df = SparkEntry.queries(name)(spark, dir)
      df.count() // trigger store builds so plans reflect cached forms
      println(df.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
