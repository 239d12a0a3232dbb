package graft.operators

import java.time.Duration

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{ColumnBridge => CB}
import graft.functions.JavaHashString

/**
 * Row-transform process analogs (reference geomesa-process-vector
 * transform/ package). The reference materializes a ListFeatureCollection
 * on one node and mutates features in a loop; here each is a single
 * codegen'd projection — fully distributed, no UDFs, survives any scale
 * the scan survives.
 */
object Transforms {

  /**
   * DateOffsetProcess analog (transform/DateOffsetProcess.scala:29-56):
   * shift `dateField` by an ISO-8601 duration string (e.g. "P1D",
   * "PT-6H", "-PT30S" — java.time.Duration grammar, like the reference).
   * The shift compiles to integer micros arithmetic, so it stays inside
   * WholeStageCodegen and is exact (no double rounding).
   */
  def dateOffset(df: DataFrame, dateField: String, timeOffset: String): DataFrame = {
    val d =
      try Duration.parse(timeOffset)
      catch {
        case e: java.time.format.DateTimeParseException =>
          throw new IllegalArgumentException(s"Invalid offset $timeOffset", e)
      }
    val micros = Math.addExact(
      Math.multiplyExact(d.getSeconds, 1000000L), d.getNano / 1000L)
    // day-time interval addition is exact micros and works for BOTH
    // TIMESTAMP and TIMESTAMP_NTZ columns (unix_micros would reject NTZ)
    val secs = java.math.BigDecimal.valueOf(micros, 6)
    df.withColumn(dateField,
      col(dateField) + make_dt_interval(lit(0), lit(0), lit(0), lit(secs)))
  }

  /** Java String.hashCode of an attribute stringified like the reference
    * (`Option(attr).map(_.toString).getOrElse("")`) — null-safe, native
    * codegen (functions/JavaHashString). */
  def javaHash(attr: Column): Column =
    CB.column(JavaHashString(CB.expression(attr.cast("string"))))

  /**
   * HashAttributeProcess analog (transform/HashAttributeProcess
   * .scala:24-78): append an int `hash` column = abs(hash(attr)) %
   * modulo. Deterministic (see JavaHashString scaladoc for the
   * goodFastHash substitution) — so it is usable as a stable shard /
   * salt key at scale, which is what the reference's WPS consumers use
   * it for (choropleth bucketing).
   */
  def hashAttribute(df: DataFrame, attribute: String, modulo: Int,
                    hashCol: String = "hash"): DataFrame = {
    require(modulo > 0, s"modulo must be positive: $modulo")
    df.withColumn(hashCol, bucketOf(col(attribute), modulo))
  }

  // abs AFTER widening to long: abs(Int.MinValue) stays negative in
  // 32 bits, which would put a hashCode of exactly -2^31 outside
  // [0, modulo) (and matches the oracle, which abs-es over BIGINT)
  private def bucketOf(attr: Column, modulo: Int): Column =
    (abs(javaHash(attr).cast("long")) % lit(modulo)).cast("int")

  /** HashAttributeColorProcess analog: the same bucket mapped onto the
    * reference's fixed 7-color palette (HashAttributeProcess.scala:81-97). */
  private val Colors = Array(
    "#6495ED", "#B0C4DE", "#00FFFF", "#9ACD32", "#00FA9A", "#FFF8DC", "#F5DEB3")

  def hashAttributeColor(df: DataFrame, attribute: String, modulo: Int,
                         hashCol: String = "hash"): DataFrame = {
    require(modulo > 0, s"modulo must be positive: $modulo")
    val bucket = bucketOf(col(attribute), modulo)
    df.withColumn(hashCol, element_at(lit(Colors), (bucket % Colors.length) + 1))
  }
}
