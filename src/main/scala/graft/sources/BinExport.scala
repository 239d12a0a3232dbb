package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The reference's BIN wire format, byte-exact — little-endian records of
 * 16 bytes (trackId:int, dtgSeconds:int, lat:float, lon:float) or 24
 * bytes (+ label:long), the format its viz consumers read
 * (geomesa-utils/.../bin/BinaryOutputCallback.scala:28-42,
 * BinaryEncodeCallback.scala:24-40, BinaryOutputEncoder.scala:85-130).
 * `Export.bin` keeps the columnar Parquet framing for Spark-to-Spark
 * handoff; this writer produces the actual `.bin` files.
 *
 * Field conversions match the reference exactly
 * (BinaryOutputEncoder.convertToTrack/convertToDate/convertToLabel):
 * track = value.hashCode (0 for null; Java String.hashCode for strings),
 * dtg = epoch millis / 1000 as int, label = numeric longValue or the
 * first 8 UTF-8 bytes packed little-endian (0 for null).
 *
 * Scale shape: the encoding is a per-row projection inside the writer
 * task (no driver collect, no plan UDF); files are written one per
 * partition with the attempt-private temp + rename task-commit protocol
 * (same as ArrowExport). `sortByTime = true` range-partitions on dtg so
 * records are chronologically ordered within AND across part files —
 * the distributed form of the reference's query-time BinSorter merge
 * (utils/bin/BinSorter; its in-encoder DateOrdering compares the date's
 * little-endian bytes LSB-first, so the *chronological* contract is the
 * sorter's, which is what we implement).
 */
object BinExport {

  /** Decoded record (BinaryOutputEncoder.EncodedValues analog); label is
    * -1 for 16-byte records, like the reference's decode callback. */
  final case class EncodedValues(trackId: Int, lat: Float, lon: Float, dtg: Long, label: Long)

  /** BinaryOutputEncoder.convertToTrack:93-94. */
  def trackToInt(track: Any): Int = if (track == null) 0 else track.hashCode

  /** BinaryOutputEncoder.convertToLabel:99-110. */
  def labelToLong(label: Any): Long = label match {
    case null => 0L
    case n: Number => n.longValue()
    case other =>
      var sum = 0L
      var i = 0
      val bytes = other.toString.getBytes(StandardCharsets.UTF_8)
      while (i < bytes.length && i < 8) {
        sum += (bytes(i) & 0xffL) << (8 * i)
        i += 1
      }
      sum
  }

  /** 16-byte record (BinaryOutputCallback.put:28-33). */
  def encode(trackId: Int, lat: Float, lon: Float, dtgMillis: Long): Array[Byte] = {
    val buf = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(trackId).putInt((dtgMillis / 1000).toInt).putFloat(lat).putFloat(lon)
    buf.array()
  }

  /** 24-byte record (BinaryOutputCallback.put:39-42). */
  def encode(trackId: Int, lat: Float, lon: Float, dtgMillis: Long, label: Long): Array[Byte] = {
    val buf = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(trackId).putInt((dtgMillis / 1000).toInt).putFloat(lat).putFloat(lon)
    buf.putLong(label)
    buf.array()
  }

  /** Decode one 16- or 24-byte record (BinaryOutputEncoder.decode:117-130). */
  def decode(record: Array[Byte]): EncodedValues = {
    val buf = ByteBuffer.wrap(record).order(ByteOrder.LITTLE_ENDIAN)
    val trackId = buf.getInt
    val time = buf.getInt * 1000L
    val lat = buf.getFloat
    val lon = buf.getFloat
    val label = if (record.length > 16) buf.getLong else -1L
    EncodedValues(trackId, lat, lon, time, label)
  }

  /** Decode a whole stream of fixed-size records. */
  def decodeAll(bytes: Array[Byte], recordSize: Int): Seq[EncodedValues] = {
    require(recordSize == 16 || recordSize == 24, s"record size must be 16 or 24: $recordSize")
    require(bytes.length % recordSize == 0,
      s"byte length ${bytes.length} is not a multiple of $recordSize")
    bytes.grouped(recordSize).map(decode).toSeq
  }

  /**
   * Write `.bin` part files. `track` and `label` columns are taken
   * RAW (any type) and converted with the reference's rules inside the
   * writer; `dtg` is anything castable to timestamp. Returns the total
   * record count.
   */
  def write(df: DataFrame, path: String,
            track: String, dtg: String, lon: String, lat: String,
            label: Option[String] = None,
            sortByTime: Boolean = false,
            sortPartitions: Int = 0): Long = {
    val base = df.select(
      (col(track) +: label.map(col).toSeq) ++ Seq(
        unix_millis(col(dtg).cast("timestamp")).as("__millis"),
        col(lon).cast("float").as("__lon"),
        col(lat).cast("float").as("__lat")): _*)
    val projected =
      if (!sortByTime) base
      else {
        val n = if (sortPartitions > 0) sortPartitions
          else df.sparkSession.sessionState.conf.numShufflePartitions
        base.repartitionByRange(math.max(1, n), col("__millis"))
          .sortWithinPartitions("__millis")
      }
    val hasLabel = label.isDefined
    val counts = projected.rdd.mapPartitionsWithIndex { (pid, it) =>
      val conf = new Configuration()
      val dir = new Path(path)
      val fs = dir.getFileSystem(conf)
      fs.mkdirs(dir)
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(_.taskAttemptId()).getOrElse(0L)
      val finalPath = new Path(dir, f"part-$pid%05d.bin")
      val tmpPath = new Path(dir, f".part-$pid%05d-$attempt.bin.tmp")
      val out = fs.create(tmpPath, true)
      var n = 0L
      try {
        val buffered = new ByteArrayOutputStream(1 << 16)
        it.foreach { row =>
          val trackId = trackToInt(row.get(0))
          val off = if (hasLabel) 1 else 0
          val millis = if (row.isNullAt(1 + off)) 0L else row.getLong(1 + off)
          val lonV = if (row.isNullAt(2 + off)) 0f else row.getFloat(2 + off)
          val latV = if (row.isNullAt(3 + off)) 0f else row.getFloat(3 + off)
          val rec =
            if (hasLabel) encode(trackId, latV, lonV, millis, labelToLong(row.get(1)))
            else encode(trackId, latV, lonV, millis)
          buffered.write(rec)
          n += 1
          if (buffered.size() >= (1 << 16)) { buffered.writeTo(out); buffered.reset() }
        }
        buffered.writeTo(out)
      } finally out.close()
      // a committed twin (retry / speculative attempt) wins and our tmp
      // is dropped; a rename failure with NO committed twin must fail
      // the task loudly — silently deleting the tmp would report n
      // records that never reached the output
      if (fs.exists(finalPath)) fs.delete(tmpPath, false)
      else if (!fs.rename(tmpPath, finalPath) && !fs.exists(finalPath))
        throw new java.io.IOException(s"BinExport: failed to commit $tmpPath -> $finalPath")
      Iterator.single(n)
    }.collect()
    counts.sum
  }

  /**
   * Line mode (BinaryOutputEncoder.toValues line branch, exercised by
   * BinaryOutputEncoderTest "encode a line feature collection"): one
   * record per LineString vertex, dtg taken positionally from a
   * same-length array column. Pure-plan explode (st_numPoints /
   * st_pointN / element_at) — feed the result to `write`.
   */
  def explodeLine(df: DataFrame, geomCol: String, datesCol: String,
                  lonOut: String = "lon", latOut: String = "lat",
                  dtgOut: String = "dtg"): DataFrame =
    // the n > 0 guard matters: Spark's sequence(1, 0) yields a
    // DESCENDING [1, 0], not an empty array — an empty LineString must
    // emit zero records (null geometry drops via explode(null) as-is).
    // Named-udf registry refs, not expr("st_...") SQL text, so this
    // works on sessions that never called StFunctions.register.
    {
      val fn = graft.functions.StFunctions.fn _
      val nPts = fn("st_numPoints")(col(geomCol))
      def vertex = fn("st_pointN")(col(geomCol), col("__vi"))
      df.withColumn("__vi", explode(when(nPts > 0, sequence(lit(1), nPts))))
        .withColumn(lonOut, fn("st_x")(vertex))
        .withColumn(latOut, fn("st_y")(vertex))
        .withColumn(dtgOut, element_at(col(datesCol), col("__vi")))
        .drop("__vi")
    }
}
