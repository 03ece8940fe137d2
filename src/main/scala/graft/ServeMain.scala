package graft

import org.apache.spark.sql.SparkSession
import graft.queries.TsQueries
import graft.remote.{RemoteReadServer, RemoteWrite}
import graft.tsdb.{Labels, TsQuerier, TsStore}

/** Remote-read/-write server entry point (the reference's `server`
  * subcommand, `main.go:47-81`, plus beyond-reference `/write` and the
  * Prometheus HTTP query API `/api/v1/query_range`, answered by the
  * in-engine PromQL front-end).
  *
  * Usage: `runMain graft.ServeMain [storeDirOrSfDir] [port]
  * [--config=agni.yml]`
  *  - a dir containing `events.parquet` → served read-only via the
  *    events mapping;
  *  - otherwise treated as a canonical store written by TsStore.write /
  *    TsdbBlock.ingest — served for reads AND accepting remote-write
  *    appends (each read resolves a fresh store view).
  * The config flag applies the reference's remote-store YAML
  * ([[graft.tsdb.GraftConfig]]) as s3a settings, so the store dir may
  * be `s3a://bucket/...`.
  */
object ServeMain {
  def main(rawArgs: Array[String]): Unit = {
    val spark = SparkSession.builder().master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (_, args) = graft.tsdb.GraftConfig.fromArgs(
      rawArgs, spark.sparkContext.hadoopConfiguration)
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val port = if (args.length > 1) args(1).toInt else 19090
    val isEventsDir = graft.tsdb.BlockIO.exists(
      graft.tsdb.BlockIO.child(dir, "events.parquet"))
    def querier: TsQuerier =
      if (isEventsDir)
        new TsQuerier(TsQueries.store(spark, dir), promoted = Seq(Labels.MetricName))
      else TsStore.read(spark, dir)
    val server = new RemoteReadServer(querier, port,
      writeSink = if (isEventsDir) None
        else Some(RemoteWrite.appendToStore(spark, dir)))
    println("LISTENING on " + server.start())
    Thread.sleep(Long.MaxValue)
  }
}
