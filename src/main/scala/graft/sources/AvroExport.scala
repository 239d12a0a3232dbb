package graft.sources

import scala.jdk.CollectionConverters._
import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/**
 * Avro Object Container File export/import — the analog of the
 * reference's AvroExporter (geomesa-tools/.../export/formats/
 * AvroExporter.scala:17) and the geomesa-convert-avro input. The
 * spark-avro DATA SOURCE is not on this classpath, but the core Apache
 * Avro library is (/opt/spark/jars/avro-1.12.1.jar), so this is the
 * standard container format written through the public Avro API: any
 * Avro reader (avro-tools, fastavro, the reference itself) consumes it.
 *
 * Same file layout + task-commit contract as ArrowExport: one
 * `part-<id>.avro` per Spark partition, attempt-private temp + rename,
 * `_SUCCESS` marker — parallel with the job, never through the driver.
 *
 * Types: long, int, double, float, string, binary, boolean, timestamp
 * (logicalType timestamp-micros); nullable columns become
 * union[null, T] (the standard Avro optionality encoding).
 */
object AvroExport {

  def avroSchema(schema: StructType, name: String = "graft_record"): Schema = {
    val fields = schema.fields.map { f =>
      val base = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case TimestampType =>
          LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
        case other => throw new IllegalArgumentException(
          s"AvroExport: unsupported column type $other for ${f.name} (project first)")
      }
      val t = if (f.nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), base) else base
      new Schema.Field(f.name, t, null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(name, null, "graft", false, fields.toSeq.asJava)
  }

  /** Write the DataFrame as a directory of Avro container files. */
  def write(df: DataFrame, path: String, codec: String = "deflate"): Unit = {
    // validate on the driver: an unknown codec must fail before the job
    // launches, not per-task through spark.task.maxFailures retries
    require(codec == "deflate" || codec == "null",
      s"unsupported avro codec '$codec' (supported: deflate, null)")
    val sparkSchema = df.schema
    val schemaJson = avroSchema(sparkSchema).toString // Schema is not serializable pre-1.9 style; ship JSON
    df.rdd.mapPartitionsWithIndex { (pid, it) =>
      val conf = new Configuration()
      val dir = new Path(path)
      val fs = dir.getFileSystem(conf)
      fs.mkdirs(dir)
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(_.taskAttemptId()).getOrElse(0L)
      val finalPath = new Path(dir, f"part-$pid%05d.avro")
      val tmpPath = new Path(dir, f".part-$pid%05d-$attempt.avro.tmp")
      val schema = new Schema.Parser().parse(schemaJson)
      val out = fs.create(tmpPath, true)
      val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
      codec match {
        case "deflate" => writer.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
        case "null" => // uncompressed
        case other => throw new IllegalArgumentException(s"unsupported avro codec $other")
      }
      writer.create(schema, out)
      try {
        val fields = sparkSchema.fields
        it.foreach { row =>
          val rec = new GenericData.Record(schema)
          var c = 0
          while (c < fields.length) {
            val v =
              if (row.isNullAt(c)) null
              else fields(c).dataType match {
                case StringType => row.getString(c)
                case BinaryType => java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](c))
                case TimestampType =>
                  val t = row.getAs[java.sql.Timestamp](c)
                  java.lang.Long.valueOf(Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L)
                case _ => row.get(c).asInstanceOf[AnyRef]
              }
            rec.put(c, v)
            c += 1
          }
          writer.append(rec)
        }
      } finally writer.close() // closes the stream too
      // committed twin wins; a rename failure with NO twin fails the
      // task loudly instead of silently discarding the partition
      if (fs.exists(finalPath)) fs.delete(tmpPath, false)
      else if (!fs.rename(tmpPath, finalPath) && !fs.exists(finalPath))
        throw new java.io.IOException(s"AvroExport: failed to commit $tmpPath -> $finalPath")
      Iterator.empty[Int]
    }.count()
    val fs = new Path(path).getFileSystem(new Configuration())
    fs.create(new Path(path, "_SUCCESS"), true).close()
  }

  /** Read a directory of Avro container files back as a DataFrame — the
    * geomesa-convert-avro input analog (each file decoded in the
    * executor that gets it). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val fs = new Path(path).getFileSystem(new Configuration())
    val files = fs.listStatus(new Path(path))
      .map(_.getPath).filter(_.getName.endsWith(".avro")).map(_.toString).toSeq
    val fieldMeta = schema.fields.map(f => (f.name, f.dataType))
    val rdd = spark.sparkContext.parallelize(files, math.max(1, files.size)).flatMap { f =>
      val conf = new Configuration()
      val p = new Path(f)
      val pfs = p.getFileSystem(conf)
      val len = pfs.getFileStatus(p).getLen
      require(len <= Int.MaxValue - 8, s"$f is ${len}B; bounded at 2GB per file")
      val in = pfs.open(p)
      val bytes = new Array[Byte](len.toInt)
      in.readFully(bytes); in.close()
      val reader = new DataFileReader[GenericRecord](
        new SeekableByteArrayInput(bytes), new GenericDatumReader[GenericRecord]())
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      try {
        while (reader.hasNext) {
          val rec = reader.next()
          out += Row.fromSeq(fieldMeta.toSeq.map { case (name, dt) =>
            val v = rec.get(name)
            if (v == null) null
            else dt match {
              case StringType => v.toString // avro Utf8 -> String
              case BinaryType =>
                val bb = v.asInstanceOf[java.nio.ByteBuffer]
                val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr); arr
              case TimestampType =>
                val micros = v.asInstanceOf[java.lang.Long].longValue()
                val t = new java.sql.Timestamp(Math.floorDiv(micros, 1000L))
                t.setNanos(Math.floorMod(micros, 1000000L).toInt * 1000)
                t
              case _ => v
            }
          })
        }
      } finally reader.close()
      out.iterator
    }
    spark.createDataFrame(rdd, schema)
  }
}
