package graft.sources

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Arrow IPC (Feather v2) ingestion — the reference's Arrow scan
  * (reference `src/function/table/arrow.cpp`, `arrow_conversion.cpp`)
  * re-expressed for the JVM engine. SURVEY §2.1 marked this surface
  * PySpark-only; this closes it natively: Spark ships arrow-vector, so
  * an IPC file (the on-disk spelling of the in-memory tables the
  * reference scans zero-copy) reads straight into a DataFrame.
  *
  * Scale posture: files parallelize one-per-task (IPC files are not
  * block-splittable; record batches within a file stream through the
  * task without ever materializing the whole file as rows in memory —
  * the iterator converts one batch at a time). Paths must be
  * task-readable (shared FS / local), the same contract every
  * file-based source has. The writer is the INTERCHANGE surface — it
  * collects to the driver by design, exactly like the reference's
  * in-memory Arrow tables; it is for handing query results to
  * Arrow-speaking consumers (and the round-trip spec), not a big-data
  * sink (COPY TO parquet is that).
  *
  * Type surface: the fixture-relevant scalars — BIGINT, INT, DOUBLE,
  * FLOAT, VARCHAR, BOOL, TIMESTAMP(µs). Anything else refuses loudly
  * with the type name (the translate-or-refuse contract).
  */
object ArrowSource {

  private def toSparkType(f: Field): DataType = f.getType match {
    case i: ArrowType.Int if i.getBitWidth == 64 => LongType
    case i: ArrowType.Int if i.getBitWidth == 32 => IntegerType
    case fp: ArrowType.FloatingPoint =>
      if (fp.getPrecision.name == "DOUBLE") DoubleType else FloatType
    case _: ArrowType.Utf8 => StringType
    case _: ArrowType.Bool => BooleanType
    case t: ArrowType.Timestamp
        if t.getUnit == org.apache.arrow.vector.types.TimeUnit.MICROSECOND =>
      TimestampType
    case other => throw new IllegalArgumentException(
      s"ArrowSource: unsupported Arrow type $other for field '${f.getName}' — " +
        "supported: Int32/64, Float/Double, Utf8, Bool, Timestamp(us)")
  }

  /** Schema of an IPC file (reads the footer only). */
  def schemaOf(path: String): StructType = {
    val alloc = new RootAllocator()
    val ch = java.nio.channels.FileChannel.open(java.nio.file.Paths.get(path))
    try {
      val reader = new ArrowFileReader(ch, alloc)
      try StructType(reader.getVectorSchemaRoot.getSchema.getFields
        .toArray(Array.empty[Field]).map(f =>
          StructField(f.getName, toSparkType(f), nullable = true)))
      finally reader.close()
    } finally { ch.close(); alloc.close() }
  }

  private def valueAt(v: FieldVector, i: Int): Any =
    if (v.isNull(i)) null
    else v match {
      case x: BigIntVector => x.get(i)
      case x: IntVector => x.get(i)
      case x: Float8Vector => x.get(i)
      case x: Float4Vector => x.get(i)
      case x: VarCharVector => new String(x.get(i), "UTF-8")
      case x: BitVector => x.get(i) == 1
      case x: TimeStampMicroVector =>
        // µs since epoch → Timestamp with full sub-ms precision
        val us = x.get(i)
        val t = new java.sql.Timestamp(Math.floorDiv(us, 1000L))
        t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
        t
      case other => throw new IllegalArgumentException(
        s"ArrowSource: unsupported vector ${other.getClass.getSimpleName}")
    }

  /** Read one or more Arrow IPC files as a DataFrame (one task per
    * file; batches stream through the task iterator). */
  def read(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "ArrowSource.read: no paths")
    val schema = schemaOf(paths.head)
    val rdd = spark.sparkContext.parallelize(paths, paths.size)
      .mapPartitions { it =>
        it.flatMap { p =>
          val alloc = new RootAllocator()
          val ch = java.nio.channels.FileChannel
            .open(java.nio.file.Paths.get(p))
          val reader = new ArrowFileReader(ch, alloc)
          // Idempotent close shared by the exhausted-iterator path and the
          // task-completion listener: a partially consumed iterator (e.g.
          // under df.limit) or an exception mid-batch would otherwise leak
          // the file handle and Arrow allocations in the executor
          // (round-13 advice). Completion listeners fire on success AND
          // failure, so one registration covers both.
          var closed = false
          def closeAll(): Unit = if (!closed) {
            closed = true
            try reader.close()
            finally { try ch.close() finally alloc.close() }
          }
          Option(org.apache.spark.TaskContext.get()).foreach(
            _.addTaskCompletionListener[Unit](_ => closeAll()))
          // Every file's footer schema must match the head file's (read())
          // derived the DataFrame schema from paths.head alone): a file
          // with a different column order or type would otherwise yield
          // miscast rows or an opaque ClassCastException mid-scan.
          val fileSchema = StructType(
            reader.getVectorSchemaRoot.getSchema.getFields
              .toArray(Array.empty[Field])
              .map(f => StructField(f.getName, toSparkType(f), nullable = true)))
          if (fileSchema != schema) {
            closeAll()
            throw new IllegalArgumentException(
              s"ArrowSource: schema mismatch in '$p' — expected " +
                s"${schema.simpleString} (from '${paths.head}'), got " +
                s"${fileSchema.simpleString}")
          }
          // one record batch at a time: the only full-batch state is the
          // Arrow buffers themselves, released before the next load
          new Iterator[Row] {
            private var root: VectorSchemaRoot = _
            private var idx = 0
            private var rows = 0
            private def advance(): Boolean = {
              while (idx >= rows) {
                if (!reader.loadNextBatch()) {
                  closeAll(); return false
                }
                root = reader.getVectorSchemaRoot
                rows = root.getRowCount; idx = 0
              }
              true
            }
            override def hasNext: Boolean = advance()
            override def next(): Row = {
              if (!advance()) throw new NoSuchElementException
              val vs = root.getFieldVectors
              val arr = new Array[Any](vs.size)
              var c = 0
              while (c < vs.size) { arr(c) = valueAt(vs.get(c), idx); c += 1 }
              idx += 1
              Row.fromSeq(arr.toIndexedSeq)
            }
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Write a DataFrame as ONE Arrow IPC file — the interchange surface
    * (collects to the driver; see the object Scaladoc). */
  def write(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    val alloc = new RootAllocator()
    val arrowSchema = new org.apache.arrow.vector.types.pojo.Schema(
      java.util.Arrays.asList(schema.fields.map { f =>
        val t: ArrowType = f.dataType match {
          case LongType => new ArrowType.Int(64, true)
          case IntegerType => new ArrowType.Int(32, true)
          case DoubleType => new ArrowType.FloatingPoint(
            org.apache.arrow.vector.types.FloatingPointPrecision.DOUBLE)
          case FloatType => new ArrowType.FloatingPoint(
            org.apache.arrow.vector.types.FloatingPointPrecision.SINGLE)
          case StringType => new ArrowType.Utf8()
          case BooleanType => new ArrowType.Bool()
          case TimestampType => new ArrowType.Timestamp(
            org.apache.arrow.vector.types.TimeUnit.MICROSECOND, null)
          case other => throw new IllegalArgumentException(
            s"ArrowSource.write: unsupported Spark type $other")
        }
        Field.nullable(f.name, t)
      }: _*))
    val root = VectorSchemaRoot.create(arrowSchema, alloc)
    val ch = java.nio.channels.FileChannel.open(
      java.nio.file.Paths.get(path),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE,
      java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
    val writer = new ArrowFileWriter(root, null, ch)
    try {
      writer.start()
      val rows = df.collect()
      root.allocateNew()
      rows.zipWithIndex.foreach { case (r, i) =>
        schema.fields.zipWithIndex.foreach { case (f, c) =>
          val v = root.getVector(c)
          if (r.isNullAt(c)) v.asInstanceOf[FieldVector].setNull(i)
          else (v, f.dataType) match {
            case (x: BigIntVector, _) => x.setSafe(i, r.getLong(c))
            case (x: IntVector, _) => x.setSafe(i, r.getInt(c))
            case (x: Float8Vector, _) => x.setSafe(i, r.getDouble(c))
            case (x: Float4Vector, _) => x.setSafe(i, r.getFloat(c))
            case (x: VarCharVector, _) =>
              x.setSafe(i, r.getString(c).getBytes("UTF-8"))
            case (x: BitVector, _) => x.setSafe(i, if (r.getBoolean(c)) 1 else 0)
            case (x: TimeStampMicroVector, _) =>
              val t = r.getTimestamp(c)
              // whole seconds from getTime (floor), sub-second from nanos
              x.setSafe(i,
                Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L)
            case (other, dt) => throw new IllegalArgumentException(
              s"ArrowSource.write: $dt -> ${other.getClass.getSimpleName}")
          }
        }
      }
      root.setRowCount(rows.length)
      writer.writeBatch()
      writer.end()
    } finally { writer.close(); ch.close(); root.close(); alloc.close() }
  }
}
