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
  * [--config=agni.yml] [--rules=rules.yml]`
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
    val (_, args0) = graft.tsdb.GraftConfig.fromArgs(
      rawArgs, spark.sparkContext.hadoopConfiguration)
    // --rules=<path>: serve /api/v1/rules and /api/v1/alerts from a
    // Prometheus rule file (re-read per request, so edits apply live —
    // the batch analog of the upstream SIGHUP reload)
    val (ruleFlags, args) = args0.partition(_.startsWith("--rules="))
    val rulesPath = ruleFlags.lastOption.map(_.substring("--rules=".length))
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val port = if (args.length > 1) args(1).toInt else 19090
    val isEventsDir = graft.tsdb.BlockIO.exists(
      graft.tsdb.BlockIO.child(dir, "events.parquet"))
    def querier: TsQuerier =
      if (isEventsDir)
        new TsQuerier(TsQueries.store(spark, dir), promoted = Seq(Labels.MetricName))
      // deletion-masked: admin delete_series is visible to the next
      // query immediately (mask re-read per request), physical after
      // clean_tombstones
      else new TsQuerier(graft.tsdb.TsDeletions.readMasked(spark, dir))
    // /api/v1/status/config serves the raw --config file, re-read per
    // request (live, same convention as --rules)
    val configPath = rawArgs.filter(_.startsWith("--config="))
      .lastOption.map(_.substring("--config=".length))
    val server = new RemoteReadServer(querier, port,
      writeSink = if (isEventsDir) None
        else Some(RemoteWrite.appendToStore(spark, dir)),
      rulesSource = rulesPath.map { p => () =>
        graft.promql.Rules.parse(graft.tsdb.BlockIO.readString(
          p, spark.sparkContext.hadoopConfiguration), p) },
      rulesFile = rulesPath.getOrElse("rules.yml"),
      configSource = configPath.map { p => () =>
        graft.tsdb.BlockIO.readString(p, spark.sparkContext.hadoopConfiguration) },
      adminStore = if (isEventsDir) None else Some((spark, dir)))
    println("LISTENING on " + server.start())
    Thread.sleep(Long.MaxValue)
  }
}
