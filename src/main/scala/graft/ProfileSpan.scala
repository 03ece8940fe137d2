package graft

import org.apache.spark.sql.SparkSession

/** Scratch harness for the round-7 `dedup_span_index` regression hunt:
  * times the query cold, then after the bench's earlier dedup queries
  * have run (shared persists + caches in place), to isolate which
  * neighbor perturbs its plan. */
object ProfileSpan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    def q(name: String) = graft.queries.PipelineQueries.defs(name)(spark, sfDir)
    def time(name: String)(f: => Any): Double = {
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $name%-40s $s%8.3f s"); s
    }
    // bench warm-up equivalents
    val wdocs = spark.range(64).selectExpr("id as doc_id",
      "concat('warm doc alpha beta gamma delta ', id % 7, ' epsilon zeta') as text")
    graft.ops.Dedup.minhashLsh(wdocs, "doc_id", "text",
      numHashes = 16, bands = 4, shingleSize = 3, threshold = 0.0).count()

    time("COLD span_index 1")(q("dedup_span_index").count())
    time("COLD span_index 2")(q("dedup_span_index").count())
    time("COLD span_index 3")(q("dedup_span_index").count())

    // the queries that run before it alphabetically in Bench
    for (n <- Seq("dedup_clusters", "dedup_embedding", "dedup_embedding_lsh",
      "dedup_exact", "dedup_lines", "dedup_minhash_lsh", "dedup_minhash_sig",
      "dedup_ngram_jaccard", "dedup_normalized", "dedup_simhash"))
      if (graft.queries.PipelineQueries.defs.contains(n))
        time(s"pre $n")(q(n).count())

    time("WARM span_index 1")(q("dedup_span_index").count())
    time("WARM span_index 2")(q("dedup_span_index").count())
    time("WARM span_index 3")(q("dedup_span_index").count())
    q("dedup_span_index").explain(true)
    spark.stop()
  }
}
