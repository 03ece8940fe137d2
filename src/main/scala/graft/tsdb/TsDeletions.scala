package graft.tsdb

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Delta-style deletion workflow over the parquet store — the
  * generalization of the reference's tombstones (`tombstones.go`, P13)
  * from per-block (ref, interval) pairs to store-level
  * `(matchers, interval)` records, the shape of the Prometheus delete
  * API (`DELETE /api/v1/admin/tsdb/delete_series`).
  *
  *  - [[delete]] appends one record to `<store>/_deletions` (an
  *    underscore dir, invisible to partition discovery — same trick as
  *    the `_ingested` markers). Deletes are metadata-only: O(1), no data
  *    rewrite, immediately effective for readers that go through
  *    [[masked]].
  *  - [[masked]] applies pending deletions as a compiled Catalyst
  *    predicate (deletion records are few and driver-resident; the mask
  *    is codegen'd per row — no join, no shuffle).
  *  - [[materialize]] rewrites ONLY the `block_start` partitions whose
  *    time range overlaps a deletion interval (partition-pruned, the 2h
  *    alignment bounds the rewrite), then clears the deletion log —
  *    the compactor's tombstone materialization, store-level.
  */
object TsDeletions {

  final case class Deletion(seq: Long, mint: Long, maxt: Long,
                            matchers: Seq[LabelMatcher])

  private val schema: StructType = StructType.fromDDL(
    "seq long, mint long, maxt long, " +
      "matchers array<struct<tpe: string, name: string, value: string>>")

  private def dir(store: String) = BlockIO.child(store, "_deletions")

  private def tpeOf(m: MatchType): String = m match {
    case MatchType.Eq => "eq"; case MatchType.Neq => "neq"
    case MatchType.Re => "re"; case MatchType.NotRe => "nre"
    case MatchType.Prefix => "prefix"
  }
  private def tpeFrom(s: String): MatchType = s match {
    case "eq" => MatchType.Eq; case "neq" => MatchType.Neq
    case "re" => MatchType.Re; case "nre" => MatchType.NotRe
    case "prefix" => MatchType.Prefix
  }

  /** Pending deletion records (empty when none). The part files are
    * enumerated and read EXPLICITLY: handing Spark the `_deletions`
    * dir root trips the hidden-path filter (underscore prefix) and
    * logs a spurious "All paths were ignored" warning on every read —
    * noise in any log-scraping pipeline. */
  def list(spark: SparkSession, store: String): Seq[Deletion] = {
    if (!BlockIO.isDirectory(dir(store))) return Seq.empty
    val parts = BlockIO.listNames(dir(store))
      .filter(n => !n.startsWith("_") && !n.startsWith("."))
      .map(n => BlockIO.child(dir(store), n))
    if (parts.isEmpty) return Seq.empty
    spark.read.schema(schema).parquet(parts: _*).collect().toSeq
      .map { r =>
        Deletion(r.getLong(0), r.getLong(1), r.getLong(2),
          r.getSeq[Row](3).map(m =>
            LabelMatcher(tpeFrom(m.getString(0)), m.getString(1), m.getString(2))))
      }.sortBy(_.seq)
  }

  /** Append one deletion record: samples in `[mint, maxt]` on series
    * matching ALL `matchers` are dead to maskers until [[materialize]]
    * rewrites them away. Returns the record's sequence number. */
  def delete(spark: SparkSession, store: String, matchers: Seq[LabelMatcher],
             mint: Long, maxt: Long): Long = {
    require(matchers.nonEmpty, "delete: empty matcher set would drop the whole range")
    val seq = list(spark, store).lastOption.map(_.seq + 1).getOrElse(0L)
    import scala.jdk.CollectionConverters._
    val row = Row(seq, mint, maxt,
      matchers.map(m => Row(tpeOf(m.tpe), m.name, m.value)))
    spark.createDataFrame(Seq(row).asJava, schema)
      .coalesce(1).write.mode(SaveMode.Append).parquet(dir(store))
    seq
  }

  /** The deletion mask as one Catalyst predicate over a canonical-form
    * frame: true for rows that SURVIVE. Matcher values resolve through
    * [[TsSchema.labelValue]] ("" ≡ absent, the reference convention). */
  private def surviveCond(deletions: Seq[Deletion]): Option[org.apache.spark.sql.Column] =
    deletions.map { d =>
      d.matchers.map(m => m.predicate(TsSchema.labelValue(col("labels"), m.name)))
        .reduce(_ && _) && col("t").between(d.mint, d.maxt)
    }.reduceOption(_ || _).map(dead => !dead)

  /** Canonical store frame with pending deletions masked out. */
  def masked(spark: SparkSession, store: String,
             data: DataFrame): DataFrame =
    surviveCond(list(spark, store)).fold(data)(data.where)

  /** Store read with the deletion mask applied. */
  def readMasked(spark: SparkSession, store: String): DataFrame =
    masked(spark, store, spark.read.parquet(store))

  /** Rewrite the partitions a pending deletion touches (block time range
    * overlapping `[mint, maxt]`), dropping dead samples; then clear the
    * deletion log. Partition-local temp-dir + rename swap, same as
    * [[TsMaintenance.compact]]. Returns rewritten block_starts. */
  def materialize(spark: SparkSession, store: String): Seq[Long] = {
    val pending = list(spark, store)
    if (pending.isEmpty) return Seq.empty
    val touched = TsMaintenance.blocks(store).filter(b =>
      pending.exists(d => b <= d.maxt && d.mint <= b + TsSchema.BlockMs - 1))
    val cond = surviveCond(pending).get
    touched.foreach { b =>
      val pdir = BlockIO.child(store, s"block_start=$b")
      val tmp = BlockIO.child(store, s".delete-$b")
      // partition files lack the block_start column (it's in the dir
      // name); the mask only reads labels + t, both present
      spark.read.parquet(pdir).where(cond)
        .write.mode(SaveMode.Overwrite).parquet(tmp)
      val old = BlockIO.child(store, s".old-del-$b")
      BlockIO.rename(pdir, old)
      BlockIO.rename(tmp, pdir)
      BlockIO.delete(old, recursive = true)
    }
    // clear the log (all pending deletions are now physical)
    val d = dir(store)
    if (BlockIO.isDirectory(d)) BlockIO.delete(d, recursive = true)
    spark.catalog.refreshByPath(store)
    touched
  }
}
