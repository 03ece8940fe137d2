package graft.sources

import java.nio.channels.Channels

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.tsdb.BlockIO

/** Arrow IPC (Feather v2) file sink/source — the trainer-handoff
  * format: random-access, mmap-able, the on-disk layout
  * `datasets`-style loaders consume directly, written with the Arrow
  * classes Spark itself ships (no new dependency).
  *
  * Scale shape mirrors the other shard writers: one `.arrow` file per
  * non-empty partition, rows streamed through a bounded
  * `VectorSchemaRoot` (`batchRows` record batches — task memory is one
  * batch, not one partition), write-once unique names via Hadoop FS.
  * Supported column types: long/int/double/float/string/binary/bool —
  * the training-table subset; nested types stay in parquet.
  *
  * Reading loads each file through a byte-array channel (shards are
  * the unit of parallelism and bounded by construction — the writer
  * cuts at partition boundaries), so `file://`/`s3a://` both work
  * without seekable-stream adapters. */
object ArrowIO {

  private def toArrowField(f: StructField): Field = {
    val t = f.dataType match {
      case LongType => new ArrowType.Int(64, true)
      case IntegerType => new ArrowType.Int(32, true)
      case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
      case StringType => ArrowType.Utf8.INSTANCE
      case BinaryType => ArrowType.Binary.INSTANCE
      case BooleanType => ArrowType.Bool.INSTANCE
      case other => sys.error(s"ArrowIO: unsupported column type $other " +
        s"for '${f.name}' (supported: long/int/double/float/string/binary/bool)")
    }
    new Field(f.name, new FieldType(f.nullable, t, null), java.util.List.of())
  }

  private def toSparkField(f: Field): StructField = {
    val dt = f.getType match {
      case i: ArrowType.Int if i.getBitWidth == 64 => LongType
      case i: ArrowType.Int if i.getBitWidth == 32 => IntegerType
      case fp: ArrowType.FloatingPoint
        if fp.getPrecision == FloatingPointPrecision.DOUBLE => DoubleType
      case fp: ArrowType.FloatingPoint
        if fp.getPrecision == FloatingPointPrecision.SINGLE => FloatType
      case _: ArrowType.Utf8 => StringType
      case _: ArrowType.Binary => BinaryType
      case _: ArrowType.Bool => BooleanType
      case other => sys.error(s"ArrowIO: unsupported arrow type $other")
    }
    StructField(f.getName, dt, f.isNullable)
  }

  private def setCell(v: FieldVector, i: Int, value: Any): Unit = value match {
    case null => v match {
      case x: BaseFixedWidthVector => x.setNull(i)
      case x: BaseVariableWidthVector => x.setNull(i)
      case other => sys.error(s"ArrowIO: unsupported vector $other")
    }
    case x: Long => v.asInstanceOf[BigIntVector].setSafe(i, x)
    case x: Int => v.asInstanceOf[IntVector].setSafe(i, x)
    case x: Double => v.asInstanceOf[Float8Vector].setSafe(i, x)
    case x: Float => v.asInstanceOf[Float4Vector].setSafe(i, x)
    case x: String => v.asInstanceOf[VarCharVector]
      .setSafe(i, x.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    case x: Array[Byte] => v.asInstanceOf[VarBinaryVector].setSafe(i, x)
    case x: Boolean => v.asInstanceOf[BitVector].setSafe(i, if (x) 1 else 0)
    case other => sys.error(s"ArrowIO: unsupported value $other")
  }

  private def getCell(v: FieldVector, i: Int): Any =
    if (v.isNull(i)) null
    else v match {
      case x: BigIntVector => x.get(i)
      case x: IntVector => x.get(i)
      case x: Float8Vector => x.get(i)
      case x: Float4Vector => x.get(i)
      case x: VarCharVector =>
        new String(x.get(i), java.nio.charset.StandardCharsets.UTF_8)
      case x: VarBinaryVector => x.get(i)
      case x: BitVector => x.get(i) == 1
      case other => sys.error(s"ArrowIO: unsupported vector $other")
    }

  /** Write one Arrow IPC file per non-empty partition. Returns files
    * written. */
  def writeIpc(df: DataFrame, dir: String, batchRows: Int = 4096,
               prefix: String = "part"): Int = {
    val schema = df.schema
    schema.fields.foreach(toArrowField) // validate types up front
    val conf = new BlockIO.SerConf(
      df.sparkSession.sparkContext.hadoopConfiguration)
    BlockIO.mkdirs(dir, conf.value)
    val n = df.sparkSession.sparkContext.longAccumulator("arrow_files")
    val job = SinkCommit.jobToken()
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        // deterministic (job, partition) name + rename-on-success: task
        // retries and speculative twins commit exactly one file
        val won = SinkCommit.committed(dir, f"$prefix-$job-$pid%05d.arrow",
          conf) { out =>
          val allocator = new RootAllocator()
          val arrowSchema =
            new ArrowSchema(schema.fields.map(toArrowField).toList.asJava)
          val root = VectorSchemaRoot.create(arrowSchema, allocator)
          val writer = new ArrowFileWriter(root, null, Channels.newChannel(out))
          try {
            writer.start()
            val vectors = root.getFieldVectors.asScala.toArray
            var rowInBatch = 0
            def flush(): Unit = if (rowInBatch > 0) {
              root.setRowCount(rowInBatch)
              writer.writeBatch()
              vectors.foreach(_.clear())
              rowInBatch = 0
            }
            it.foreach { row =>
              var c = 0
              while (c < vectors.length) {
                setCell(vectors(c), rowInBatch, row.get(c))
                c += 1
              }
              rowInBatch += 1
              if (rowInBatch == batchRows) flush()
            }
            flush()
            writer.end()
          } finally {
            writer.close(); root.close(); allocator.close()
          }
        }
        if (won) n.add(1L)
      }
    }
    n.value.toInt
  }

  /** Read every `*.arrow` file under `dir` back into a DataFrame — one
    * task per file. */
  def readIpc(spark: SparkSession, dir: String): DataFrame = {
    val conf = new BlockIO.SerConf(spark.sparkContext.hadoopConfiguration)
    val files = BlockIO.listNames(dir).filter(_.endsWith(".arrow"))
      .sorted.map(n => BlockIO.child(dir, n))
    require(files.nonEmpty, s"no .arrow files under $dir")
    val sparkSchema = {
      val bytes = readAll(files.head, conf)
      val allocator = new RootAllocator()
      val reader = new ArrowFileReader(
        new ByteArrayReadableSeekableByteChannel(bytes), allocator)
      try StructType(reader.getVectorSchemaRoot.getSchema.getFields
        .asScala.map(toSparkField).toArray)
      finally { reader.close(); allocator.close() }
    }
    val parallelism =
      math.max(1, math.min(files.size, spark.sparkContext.defaultParallelism))
    val rows = spark.sparkContext.parallelize(files, parallelism)
      .flatMap { path =>
        val bytes = readAll(path, conf)
        val allocator = new RootAllocator()
        val reader = new ArrowFileReader(
          new ByteArrayReadableSeekableByteChannel(bytes), allocator)
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        try {
          val root = reader.getVectorSchemaRoot
          while (reader.loadNextBatch()) {
            val vectors = root.getFieldVectors.asScala.toArray
            var i = 0
            while (i < root.getRowCount) {
              out += Row.fromSeq(vectors.toIndexedSeq.map(v => getCell(v, i)))
              i += 1
            }
          }
        } finally { reader.close(); allocator.close() }
        out
      }
    spark.createDataFrame(rows, sparkSchema)
  }

  private def readAll(path: String, conf: BlockIO.SerConf): Array[Byte] = {
    val hp = new HPath(path)
    val fs = hp.getFileSystem(conf.value)
    val len = fs.getFileStatus(hp).getLen
    require(len <= Int.MaxValue, s"arrow shard too large to buffer: $path")
    val buf = new Array[Byte](len.toInt)
    val in = fs.open(hp)
    try in.readFully(0, buf) finally in.close()
    buf
  }
}
