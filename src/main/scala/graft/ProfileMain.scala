package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling harness (not part of the driver contract). */
object ProfileMain {
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
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    // bench-condition reproduction: dedup_clusters as the first heavy
    // query on a cold session (the shape Bench charges 17s to)
    time("COLD dedup_clusters")(
      graft.queries.PipelineQueries.defs("dedup_clusters")(spark, sfDir).count())
    time("WARM dedup_clusters")(
      graft.queries.PipelineQueries.defs("dedup_clusters")(spark, sfDir).count())
    time("WARM2 dedup_clusters")(
      graft.queries.PipelineQueries.defs("dedup_clusters")(spark, sfDir).count())
    time("COLD dedup_keep_best")(
      graft.queries.PipelineQueries.defs("dedup_keep_best")(spark, sfDir).count())

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("docs.count")(docs.count())

    import graft.ops.Dedup._
    import graft.functions._
    time("tokens only")(
      docs.select(size(tokens(col("text"))).as("n")).agg(sum("n")).collect())
    time("shingles only")(
      docs.select(size(shingles(col("text"), 3)).as("n")).agg(sum("n")).collect())
    time("hs only")(
      docs.select(size(shingleHashes(col("text"), 3)).as("n")).agg(sum("n")).collect())
    val aLit = array((0 until 16).map(j => lit(minhashA(j))): _*)
    val bLit = array((0 until 16).map(j => lit(minhashB(j))): _*)
    val packedE = element_at(
      transform(array(shingleHashes(col("text"), 3)), hs =>
        struct(hs.as("hs"),
          transform(sequence(lit(0), lit(15)), j =>
            array_min(transform(hs, h =>
              pmod(h * element_at(aLit, j + 1) + element_at(bLit, j + 1),
                lit(MinhashP))))).as("sig"))), 1)
    time("packed, no filter")(
      docs.select(col("doc_id"), packedE.as("d")).agg(sum(size(col("d.sig")))).collect())
    time("packed, filter+extract")(
      docs.select(col("doc_id"), packedE.as("d"))
        .where(size(col("d.hs")) > 0)
        .select(col("doc_id"), col("d.hs").as("hs"), col("d.sig").as("sig"))
        .agg(sum(size(col("sig")))).collect())

    val sigs = graft.ops.Dedup.minhashSignatures(docs, "doc_id", "text", 16, 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("sigs materialize")(sigs.count())
    val cands = graft.ops.Dedup.lshCandidatePairs(sigs, 4)
    time("candidates")(println("  n_cand=" + cands.count()))
    val hs = sigs.select(col("id"), col("hs"))
    val full = cands
      .join(hs.select(col("id").as("id1"), col("hs").as("hs1")), "id1")
      .join(hs.select(col("id").as("id2"), col("hs").as("hs2")), "id2")
      .withColumn("jaccard", graft.ops.Dedup.jaccardOf(col("hs1"), col("hs2")))
      .where(col("jaccard") >= 0.2)
    time("verify join")(full.count())
    time("full pipeline (fresh)")(
      graft.ops.Dedup.minhashLsh(docs, "doc_id", "text", 16, 4, 3, 0.2).count())

    // --- connected components over the verified pair set ---
    val pairs = graft.ops.Dedup.minhashLsh(docs, "doc_id", "text", 16, 4, 3, 0.2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("pairs persist")(println("  n_pairs=" + pairs.count()))
    time("CC over warm pairs")(
      graft.ops.Dedup.connectedComponents(pairs).count())
    time("CC again")(
      graft.ops.Dedup.connectedComponents(pairs).count())

    // --- simhashPairs stages ---
    import org.apache.spark.storage.StorageLevel
    val sh = docs.select(col("doc_id").as("id"),
      graft.ops.Dedup.simhash64(col("text")).as("sh"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("simhash64 materialize")(sh.count())
    val values = sh.select(col("sh")).distinct().persist(StorageLevel.MEMORY_AND_DISK)
    time("distinct values")(values.count())
    time("simhashPairs full (fresh)")(
      graft.ops.Dedup.simhashPairs(docs, "doc_id", "text", 8).count())
    time("simhashPairs again")(
      graft.ops.Dedup.simhashPairs(docs, "doc_id", "text", 8).count())
    spark.stop()
  }
}
