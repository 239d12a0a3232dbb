package graft.sources

import java.nio.channels.Channels
import scala.jdk.CollectionConverters._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.dictionary.{Dictionary, DictionaryProvider}
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, DictionaryEncoding, Field, FieldType, Schema}
import org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, count, desc, lit}
import org.apache.spark.sql.types._

/**
 * Arrow IPC export/import — the engine's analog of the reference's
 * Arrow exporter (geomesa-tools ArrowExporter.scala:29, ArrowScan
 * .scala:37-160). Spark ships the Arrow Java libraries (they back
 * pandas-UDF transport), so the writer is the real columnar IPC *file*
 * format (readable by pyarrow.ipc.open_file, Arrow JS, DuckDB's
 * read_arrow, etc.), not a stand-in.
 *
 * Layout: one `part-<id>.arrow` IPC file per Spark partition under the
 * target directory plus a `_SUCCESS` marker — the same contract as
 * Spark's own file sinks, so the export parallelizes with the job and
 * never funnels through the driver.
 *
 * Supported column types: long, int, double, float, string, binary,
 * boolean, timestamp (as UTC microseconds) — the reference exporter's
 * effective surface (geometry travels as WKB binary or WKT string).
 */
object ArrowExport {

  private def arrowField(f: StructField): Field = {
    val t: ArrowType = f.dataType match {
      case LongType => new ArrowType.Int(64, true)
      case IntegerType => new ArrowType.Int(32, true)
      case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
      case StringType => new ArrowType.Utf8()
      case BinaryType => new ArrowType.Binary()
      case BooleanType => ArrowType.Bool.INSTANCE
      case TimestampType => new ArrowType.Timestamp(org.apache.arrow.vector.types.TimeUnit.MICROSECOND, "UTC")
      case other => throw new IllegalArgumentException(
        s"ArrowExport: unsupported column type $other for ${f.name} (project to a supported type first)")
    }
    new Field(f.name, new FieldType(f.nullable, t, null), null)
  }

  def arrowSchema(schema: StructType): Schema =
    new Schema(schema.fields.map(arrowField).toSeq.asJava)

  /**
   * Write the DataFrame as a directory of Arrow IPC files.
   *
   * `dictColumns` requests dictionary encoding for string columns — the
   * analog of the reference's TopK-seeded dictionaries (ArrowScan
   * .scala:115, `geomesa.arrow.dictionary.top` = 1000): a GLOBAL
   * dictionary (shared ids across every file/batch, ordered by
   * frequency desc then value — the TopK order) is computed in one
   * aggregation pass and broadcast to the writers. A requested column
   * whose cardinality exceeds `maxDictSize` falls back to plain UTF8
   * (encoding stays lossless); the returned set names the columns
   * actually dictionary-encoded.
   *
   * `sortBy = Some((field, reverse))` is the sorted-batch mode — the
   * analog of the reference's sorted delta merge (DeltaWriter
   * .scala:389-430, SimpleFeatureArrowIO.getSortAsMetadata at :298):
   * rows are globally ordered by the field (Spark's range-partitioned
   * sort replaces the reference's single-node k-way batch merge), so
   * every batch is internally sorted AND the `part-NNNNN.arrow` files
   * are globally ordered by part id; consumers can binary-search or
   * streaming-merge. The sort is recorded in each file's schema
   * metadata under the reference's own keys (`sort-field`,
   * `sort-order` = ascending|descending). If the sort field is also
   * dictionary-encoded, rows are still ordered by VALUE (the encoding
   * is applied after the sort); dictionary codes themselves stay in
   * TopK order.
   */
  def write(df0: DataFrame, path: String, batchRows: Int = 4096,
            dictColumns: Seq[String] = Nil, maxDictSize: Int = 1000,
            sortBy: Option[(String, Boolean)] = None,
            sortPartitions: Int = 0): Set[String] = {
    val df = sortBy match {
      case Some((field, reverse)) =>
        require(df0.schema.fieldNames.contains(field), s"sortBy column $field not in schema")
        val sortCol = if (reverse) col(field).desc else col(field).asc
        // range partition + in-partition sort = a total order across the
        // part files. An explicit partition count (default: the session's
        // shuffle parallelism) both keeps AQE from coalescing small
        // outputs to one file and avoids materializing the plan just to
        // count input partitions (df.rdd would run the upstream stages
        // once extra under AQE).
        val n = if (sortPartitions > 0) sortPartitions
          else df0.sparkSession.sessionState.conf.numShufflePartitions
        df0.repartitionByRange(math.max(1, n), sortCol).sortWithinPartitions(sortCol)
      case None => df0
    }
    val schemaMeta: Map[String, String] = sortBy match {
      // the reference's metadata contract (SimpleFeatureArrowIO.Metadata)
      case Some((field, reverse)) =>
        Map("sort-field" -> field, "sort-order" -> (if (reverse) "descending" else "ascending"))
      case None => Map.empty
    }
    val sparkSchema = df.schema
    // global dictionaries (small by construction: <= maxDictSize values)
    val dicts: Map[String, Array[String]] = dictColumns.flatMap { c =>
      require(sparkSchema(c).dataType == StringType, s"dictionary column $c must be string")
      val top = df.where(col(c).isNotNull).groupBy(col(c)).agg(count(lit(1)).as("__n"))
        .orderBy(desc("__n"), col(c)).limit(maxDictSize + 1)
        .collect().map(_.getString(0))
      if (top.length > maxDictSize) None else Some(c -> top)
    }.toMap
    val dictIds: Map[String, Long] =
      dicts.keys.toSeq.sorted.zipWithIndex.map { case (c, i) => c -> i.toLong }.toMap

    df.rdd.mapPartitionsWithIndex { (pid, it) =>
      val conf = new Configuration()
      val dir = new Path(path)
      val fs = dir.getFileSystem(conf)
      fs.mkdirs(dir)
      // task-commit protocol: write an attempt-private temp file, rename
      // into place at the end — a retry or speculative twin must never
      // interleave bytes into the final file
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(_.taskAttemptId()).getOrElse(0L)
      val finalPath = new Path(dir, f"part-$pid%05d.arrow")
      val tmpPath = new Path(dir, f".part-$pid%05d-$attempt.arrow.tmp")
      val out = fs.create(tmpPath, true)
      val allocator = new RootAllocator(Long.MaxValue)

      // dictionary-encoded fields carry int32 indices; the dictionary
      // vectors are registered with the provider and written once per file
      val provider = new DictionaryProvider.MapDictionaryProvider()
      val lookups = scala.collection.mutable.Map.empty[Int, Map[String, Int]]
      val fieldsArrow = sparkSchema.fields.zipWithIndex.map { case (f, i) =>
        dicts.get(f.name) match {
          case Some(values) =>
            val enc = new DictionaryEncoding(dictIds(f.name), false, new ArrowType.Int(32, true))
            val dictVec = new VarCharVector(s"${f.name}_dict", allocator)
            dictVec.allocateNew(values.length)
            values.zipWithIndex.foreach { case (s, j) =>
              dictVec.setSafe(j, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            }
            dictVec.setValueCount(values.length)
            provider.put(new Dictionary(dictVec, enc))
            lookups(i) = values.zipWithIndex.toMap
            new Field(f.name, new FieldType(f.nullable, new ArrowType.Int(32, true), enc), null)
          case None => arrowField(f)
        }
      }
      val root = VectorSchemaRoot.create(
        new Schema(fieldsArrow.toSeq.asJava, schemaMeta.asJava), allocator)
      val writer = new ArrowFileWriter(root, provider, Channels.newChannel(out))
      writer.start()
      try {
        val fields = sparkSchema.fields
        while (it.hasNext) {
          root.allocateNew()
          var r = 0
          while (r < batchRows && it.hasNext) {
            val row = it.next()
            var c = 0
            while (c < fields.length) {
              val v = root.getVector(c)
              if (row.isNullAt(c)) setNull(v, r)
              else lookups.get(c) match {
                case Some(dict) =>
                  val s = row.getString(c)
                  // the dictionary was built in a separate driver pass; a
                  // value appearing only now means the input is
                  // non-deterministic between the two jobs — name it
                  // instead of an opaque NoSuchElementException
                  val code = dict.getOrElse(s, throw new IllegalStateException(
                    s"ArrowExport: value '$s' in dictionary column '${fields(c).name}' was not " +
                      "present when the dictionary was built — the input DataFrame is " +
                      "non-deterministic across jobs; cache() it or drop the column from dictColumns"))
                  v.asInstanceOf[IntVector].setSafe(r, code)
                case None => setValue(v, r, row, c, fields(c).dataType)
              }
              c += 1
            }
            r += 1
          }
          root.setRowCount(r)
          writer.writeBatch()
        }
      } finally {
        writer.end(); writer.close(); root.close()
        provider.getDictionaryIds.asScala.foreach(id => provider.lookup(id).getVector.close())
        allocator.close(); out.close()
      }
      // first committer wins; a losing attempt cleans up its temp file
      // committed twin wins; a rename failure with NO twin fails the
      // task loudly instead of silently discarding the partition
      if (fs.exists(finalPath)) fs.delete(tmpPath, false)
      else if (!fs.rename(tmpPath, finalPath) && !fs.exists(finalPath))
        throw new java.io.IOException(s"ArrowExport: failed to commit $tmpPath -> $finalPath")
      Iterator.empty[Int]
    }.count() // force the write job
    val fs = new Path(path).getFileSystem(new Configuration())
    fs.create(new Path(path, "_SUCCESS"), true).close()
    dicts.keySet
  }

  private def setNull(v: FieldVector, r: Int): Unit = v match {
    case x: BigIntVector => x.setNull(r)
    case x: IntVector => x.setNull(r)
    case x: Float8Vector => x.setNull(r)
    case x: Float4Vector => x.setNull(r)
    case x: VarCharVector => x.setNull(r)
    case x: VarBinaryVector => x.setNull(r)
    case x: BitVector => x.setNull(r)
    case x: TimeStampMicroTZVector => x.setNull(r)
    case other => throw new IllegalStateException(s"unexpected vector $other")
  }

  private def setValue(v: FieldVector, r: Int, row: Row, c: Int, dt: DataType): Unit = (v, dt) match {
    case (x: BigIntVector, _) => x.setSafe(r, row.getLong(c))
    case (x: IntVector, _) => x.setSafe(r, row.getInt(c))
    case (x: Float8Vector, _) => x.setSafe(r, row.getDouble(c))
    case (x: Float4Vector, _) => x.setSafe(r, row.getFloat(c))
    case (x: VarCharVector, _) => x.setSafe(r, row.getString(c).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    case (x: VarBinaryVector, _) => x.setSafe(r, row.getAs[Array[Byte]](c))
    case (x: BitVector, _) => x.setSafe(r, if (row.getBoolean(c)) 1 else 0)
    case (x: TimeStampMicroTZVector, _) =>
      x.setSafe(r, row.getAs[java.sql.Timestamp](c).toInstant.toEpochMilli * 1000L +
        row.getAs[java.sql.Timestamp](c).getNanos / 1000 % 1000)
    case (other, d) => throw new IllegalStateException(s"unexpected vector $other for $d")
  }

  /** The sort recorded in an exported directory's schema metadata
    * (field, reverse), if the export used sorted-batch mode — read from
    * the first IPC file's schema, the reference's Metadata contract. */
  def sortOf(path: String): Option[(String, Boolean)] = {
    val fs = new Path(path).getFileSystem(new Configuration())
    val files = fs.listStatus(new Path(path))
      .map(_.getPath).filter(_.getName.endsWith(".arrow")).sortBy(_.getName)
    files.headOption.flatMap { f =>
      // footer-only read: ArrowFileReader seeks to the schema via the
      // channel, so no byte-array copy of the (possibly multi-GB) file
      val in = fs.open(f)
      val len = fs.getFileStatus(f).getLen
      val ch = new java.nio.channels.SeekableByteChannel {
        private var position0 = 0L
        private var open = true
        override def read(dst: java.nio.ByteBuffer): Int = {
          val want = dst.remaining()
          val buf = new Array[Byte](want)
          val n = in.read(position0, buf, 0, want)
          if (n > 0) { dst.put(buf, 0, n); position0 += n }
          n
        }
        override def write(src: java.nio.ByteBuffer): Int = throw new UnsupportedOperationException
        override def position(): Long = position0
        override def position(newPosition: Long): java.nio.channels.SeekableByteChannel = {
          position0 = newPosition; this
        }
        override def size(): Long = len
        override def truncate(size: Long): java.nio.channels.SeekableByteChannel =
          throw new UnsupportedOperationException
        override def isOpen: Boolean = open
        override def close(): Unit = { open = false; in.close() }
      }
      val allocator = new RootAllocator(Long.MaxValue)
      val reader = new ArrowFileReader(
        new org.apache.arrow.vector.ipc.SeekableReadChannel(ch), allocator)
      try {
        val meta = reader.getVectorSchemaRoot.getSchema.getCustomMetadata
        Option(meta.get("sort-field")).map(f => (f, meta.get("sort-order") == "descending"))
      } finally { reader.close(); allocator.close() }
    }
  }

  /** Read a directory of Arrow IPC files back as a DataFrame (the
    * inverse of `write` — each file decoded in the executor that gets
    * it). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val fs = new Path(path).getFileSystem(new Configuration())
    val files = fs.listStatus(new Path(path))
      .map(_.getPath).filter(_.getName.endsWith(".arrow")).map(_.toString).toSeq
    val rdd = spark.sparkContext.parallelize(files, math.max(1, files.size)).flatMap { f =>
      val conf = new Configuration()
      val p = new Path(f)
      val in = p.getFileSystem(conf).open(p)
      val lenL = p.getFileSystem(conf).getFileStatus(p).getLen
      require(lenL <= Int.MaxValue - 8,
        s"$f is ${lenL}B; per-file reads are bounded at 2GB — write with more partitions")
      val len = lenL.toInt
      val bytes = new Array[Byte](len)
      in.readFully(bytes); in.close()
      val allocator = new RootAllocator(Long.MaxValue)
      val reader = new ArrowFileReader(new ByteArrayReadableSeekableByteChannel(bytes), allocator)
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      try {
        val root = reader.getVectorSchemaRoot
        while (reader.loadNextBatch()) {
          val n = root.getRowCount
          var r = 0
          while (r < n) {
            val vals = (0 until root.getFieldVectors.size()).map { c =>
              val v = root.getVector(c)
              val enc = v.getField.getDictionary
              if (enc == null) getValue(v, r)
              else if (v.isNull(r)) null
              else {
                // dictionary-encoded column: index -> dictionary value
                val dictVec = reader.getDictionaryVectors.get(enc.getId)
                  .getVector.asInstanceOf[VarCharVector]
                new String(dictVec.get(v.asInstanceOf[IntVector].get(r)),
                  java.nio.charset.StandardCharsets.UTF_8)
              }
            }
            out += Row.fromSeq(vals)
            r += 1
          }
        }
      } finally { reader.close(); allocator.close() }
      out.iterator
    }
    spark.createDataFrame(rdd, schema)
  }

  private def getValue(v: FieldVector, r: Int): Any = {
    if (v.isNull(r)) null
    else v match {
      case x: BigIntVector => x.get(r)
      case x: IntVector => x.get(r)
      case x: Float8Vector => x.get(r)
      case x: Float4Vector => x.get(r)
      case x: VarCharVector => new String(x.get(r), java.nio.charset.StandardCharsets.UTF_8)
      case x: VarBinaryVector => x.get(r)
      case x: BitVector => x.get(r) == 1
      case x: TimeStampMicroTZVector =>
        // full microsecond round-trip; floorDiv/floorMod keep pre-epoch
        // values exact (integer division would truncate toward zero)
        val micros = x.get(r)
        val t = new java.sql.Timestamp(Math.floorDiv(micros, 1000L))
        t.setNanos(Math.floorMod(micros, 1000000L).toInt * 1000)
        t
      case other => throw new IllegalStateException(s"unexpected vector $other")
    }
  }
}
