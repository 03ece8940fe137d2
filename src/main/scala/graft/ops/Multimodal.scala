package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `BINARY` columns beside typed metadata; decode / feature-extract /
  * frame-sample are per-partition batch transforms.
  *
  * The actual codec step is STUBBED (this container ships no image/audio
  * libraries): `decodeStub` derives deterministic fake dimensions from the
  * bytes. Everything around it — schema, batched `mapPartitions`
  * signature, partitioning, output shape — is the real scale path: on a
  * cluster the stub body is replaced by a JNI/codec call and nothing else
  * changes.
  *
  * Scale design (100 TB of media): payloads stay in their scan partition
  * end-to-end (no shuffle introduced by decode); metadata-only queries
  * never touch the binary column thanks to Parquet column pruning.
  */
object Multimodal {

  /** Canonical media-table schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("source", StringType, nullable = true),
      StructField("mime", StringType, nullable = true),
      StructField("n_bytes", LongType, nullable = false))), nullable = false)))

  /** Wrap any table with a synthetic binary payload column (UTF-8 bytes of
    * a text column here; real pipelines read raw files / blob columns). */
  def synthesize(df: DataFrame, idCol: String, textCol: String, kind: String,
                 sourceCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        col(sourceCol).as("source"),
        lit("application/octet-stream").as("mime"),
        length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes")).as("meta"))

  /** STUB decode: deterministic fake (width, height, channels) from the
    * payload bytes — a real build calls the codec here. Pure column
    * expressions, so the "decode" stays codegen'd and partition-local. */
  def decodeStub(payload: Column): Column = {
    val h = conv(substring(md5(payload), 1, 15), 16, 10).cast("long")
    struct(
      (pmod(h, lit(1024L)) + 32L).as("width"),
      (pmod(shiftright(h, 10), lit(1024L)) + 32L).as("height"),
      (pmod(h, lit(3L)) + 1L).as("channels"))
  }

  /** STUB feature extraction: fixed-length deterministic feature vector
    * from payload bytes (stands in for an image/audio embedding model). */
  def featureStub(payload: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)), i =>
      round(pmod(crc32(concat(payload, i.cast("string").cast("binary"))).cast("double"),
        lit(1000.0d)) / 1000.0d, 6))

  /** Frame sampling plumbing for video-like payloads: split the payload
    * into `frameBytes`-sized windows, keep every `stride`-th. Output one
    * row per sampled frame — the explode pattern a real frame sampler
    * uses; partition-local, no shuffle. */
  def sampleFrames(df: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    df.select(col("media_id"), col("kind"), col("meta"),
      posexplode(filter(
        transform(sequence(lit(0), (col("meta.n_bytes") / frameBytes).cast("int")),
          i => when(pmod(i, lit(stride)) === 0,
            substring(col("payload"), (i * frameBytes + 1).cast("int"), lit(frameBytes)))
            .otherwise(lit(null).cast("binary"))),
        f => f.isNotNull)))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame")
      .where(length(col("frame")) > 0)

  /** Batched low-level decode path via mapPartitions over an iterator of
    * rows — the signature a JNI codec integration needs (amortizes
    * per-batch setup). The stub "decode" is the 60-bit md5 prefix of the
    * payload, computed with a per-partition MessageDigest (the init-once
    * slot a real codec context occupies) — md5-based so the DuckDB oracle
    * can recompute it exactly. */
  def decodeBatched(spark: SparkSession, df: DataFrame): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("decoded_ok", BooleanType, nullable = false),
      StructField("checksum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    df.select(col("media_id"), col("payload")).mapPartitions { rows =>
      // per-partition init happens once (real codecs allocate contexts here)
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        md.reset()
        val bytes = r.getAs[Array[Byte]]("payload")
        val hex = md.digest(bytes).take(8).map(b => f"$b%02x").mkString
        Row(r.getLong(0), bytes.nonEmpty, java.lang.Long.parseLong(hex.take(15), 16))
      }
    }(enc)
  }
}
