package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTest
import graft.geom.GeomOps
import graft.table.GeomTable
import org.locationtech.jts.io.WKTReader

/**
 * Extent tables through the `format("graft")` front door: the manifest
 * decides the relation kind, envelope-bounds conjuncts route through
 * the chunk-pruned scan, ECQL compiles against the stored WKB, SQL
 * works via CREATE TABLE, and overwrite safety covers geom chains.
 */
class GeomFormatSpec extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private def newRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-geomfmt").toString

  private val reader = new WKTReader()
  private def box(x: Double, y: Double, w: Double, h: Double): Array[Byte] =
    GeomOps.toWkb(reader.read(
      s"POLYGON(($x $y, ${x + w} $y, ${x + w} ${y + h}, $x ${y + h}, $x $y))"))

  private def twoClusters =
    ((0 until 20).map(i => (s"w$i", "west", i.toLong, box(-120.0 + i * 0.01, 35.0, 0.3, 0.2))) ++
      (0 until 20).map(i => (s"e$i", "east", i.toLong, box(140.0 + i * 0.01, -20.0, 0.3, 0.2))))
      .toDF("id", "name", "age", "geom")

  test("write + read an extent table through the format; envelope conjuncts " +
    "prune chunk directories") {
    val root = newRoot()
    twoClusters.write.format("graft")
      .option("snapshot", "s1").option("geom", "geom").save(root)
    val df = spark.read.format("graft").load(root)
    assert(df.count() == 40)
    assert(df.columns.contains("xz_chunk") && df.columns.contains("minx"))

    // the envelope-overlap idiom routes through readEnvelope: an
    // east-side window must scan ZERO west-chunk files
    val east = df.where($"maxx" >= 139.0 && $"minx" <= 142.0 &&
      $"maxy" >= -21.0 && $"miny" <= -19.0)
    assert(east.count() == 20)
    val westChunks = GeomTable.read(spark, root, "s1")
      .where($"minx" < 0).select("xz_chunk").distinct().as[Long].collect()
      .map(c => s"xz_chunk=$c").toSet
    val scanned = east.select(input_file_name().as("f")).distinct().as[String]
      .collect().toSet
    assert(scanned.nonEmpty &&
      scanned.forall(f => !westChunks.exists(f.contains)),
      s"west chunks scanned by an east envelope query: $scanned")
  }

  test("SQL over an extent table: CREATE TABLE USING graft + cql option") {
    val root = newRoot()
    twoClusters.write.format("graft")
      .option("snapshot", "s1").option("geom", "geom").save(root)
    spark.sql("DROP TABLE IF EXISTS geom_fmt_t")
    spark.sql(s"CREATE TABLE geom_fmt_t USING graft OPTIONS (path '$root')")
    assert(spark.sql("SELECT count(*) FROM geom_fmt_t WHERE name = 'west'")
      .head().getLong(0) == 20)
    spark.sql("DROP TABLE geom_fmt_t")
    // ECQL against the stored WKB geometry
    val viaCql = spark.read.format("graft")
      .option("cql", "BBOX(geom, 139, -21, 142, -19) AND age < 5").load(root)
    assert(viaCql.count() == 5)
  }

  test("an indexed attribute equality upgrades the format scan to the " +
    "bucket-pruned layout") {
    val root = newRoot()
    twoClusters.write.format("graft")
      .option("snapshot", "s1").option("geom", "geom").save(root)
    GeomTable.writeAttributeIndex(spark, root, "s1", "name", buckets = 8)
    val df = spark.read.format("graft").load(root)
    val west = df.where($"name" === "west")
    assert(west.count() == 20)
    // every scanned file belongs to the index layout, not the primary
    val scanned = west.select(input_file_name().as("f")).distinct().as[String]
      .collect().toSet
    assert(scanned.nonEmpty && scanned.forall(_.contains("index_name/")),
      s"equality must route through the attr layout: $scanned")
    // combined with other predicates the answer stays exact
    assert(df.where($"name" === "west" && $"age" < 5).count() == 5)
  }

  test("scoped geom mutations resolve through the format; overwrite refuses " +
    "when a descendant references the snapshot's files") {
    val root = newRoot()
    twoClusters.write.format("graft")
      .option("snapshot", "s1").option("geom", "geom").save(root)
    GeomTable.deleteWhere(spark, root, "s1", "s2", "name = 'west' AND age < 5")
    // default read = latest commit (s2), resolving inherited east chunks
    assert(spark.read.format("graft").load(root).count() == 35)
    // s2 inherits east from s1 -> overwriting s1 must refuse
    val err = intercept[IllegalArgumentException] {
      twoClusters.write.format("graft").mode("overwrite")
        .option("snapshot", "s1").option("geom", "geom").save(root)
    }
    assert(err.getMessage.contains("reference"), err.getMessage)
  }

  test("geom format write composes `indexed` + stats-on-write like the " +
    "point path; explicit disable wins") {
    val root = newRoot()
    twoClusters.write.format("graft")
      .option("snapshot", "s1").option("geom", "geom")
      .option("indexed", "name").save(root)
    assert(GeomTable.indexedColumns(spark, root, "s1").keySet == Set("name"))
    assert(graft.table.TableStats.cached(spark, root, "s1").exists(_.count == 40))
    val root2 = newRoot()
    twoClusters.write.format("graft")
      .option("snapshot", "s1").option("geom", "geom")
      .option("indexed", "name").option("geomesa.stats.enable", "false").save(root2)
    assert(GeomTable.indexedColumns(spark, root2, "s1").keySet == Set("name"))
    assert(!graft.table.TableStats.exists(spark, root2, "s1"))
  }

  test("temporal extent write through the format (dtg option)") {
    val root = newRoot()
    val withDtg = twoClusters.withColumn("dtg",
      expr("timestamp_millis(1704067200000 + age * 86400000)"))
    withDtg.write.format("graft")
      .option("snapshot", "s1").option("geom", "geom")
      .option("dtg", "dtg").option("period", "week").save(root)
    assert(GeomTable.manifest(spark, root, "s1").dtg.contains("dtg"))
    val df = spark.read.format("graft").load(root)
    assert(df.count() == 40 && df.columns.contains("time_bin"))
    // regression (review r5 #1): TEMPORAL layouts store XZ3 codes in
    // `xz` — the pushed envelope idiom must NOT apply XZ2-resolution
    // BETWEEN ranges to them (that silently filtered out nearly every
    // row); the pruned route answers exactly like the raw predicate
    val east = df.where($"maxx" >= 139.0 && $"minx" <= 142.0 &&
      $"maxy" >= -21.0 && $"miny" <= -19.0)
    assert(east.count() == 20, "temporal envelope pushdown lost rows")
    // and the same through readEnvelope directly
    assert(GeomTable.readEnvelope(spark, root, "s1", 139.0, -21.0, 142.0, -19.0)
      .count() == 20)
  }
}
