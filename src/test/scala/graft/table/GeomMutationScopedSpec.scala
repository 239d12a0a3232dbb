package graft.table

import java.nio.file.Files

import graft.SparkTest
import graft.geom.GeomOps
import org.apache.spark.sql.functions._
import org.locationtech.jts.io.WKTReader
import org.scalatest.funsuite.AnyFunSuite

/**
 * File-granularity proof for GeomTable mutations (VERDICT r4 #1: the
 * reference FeatureWriter is schema-generic —
 * AccumuloFeatureWriterTest:52-171; AccumuloDataStoreDeleteTest runs
 * its delete blocks over xz-indexed line/polygon types — so extent
 * layouts need delete/update/upsert parity): a mutation rewrites ONLY
 * the xz_chunk directories holding matched rows, untouched chunks are
 * carried by identical physical path, a moved geometry re-homes via
 * the mover closure, and legacy (pre-chunk) snapshots still mutate via
 * the whole-table fallback.
 */
class GeomMutationScopedSpec extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private def newRoot(): String = Files.createTempDirectory("graft-geommut").toString

  private val reader = new WKTReader()
  private def wkb(wkt: String): Array[Byte] = GeomOps.toWkb(reader.read(wkt))
  private def box(x: Double, y: Double, w: Double, h: Double): Array[Byte] =
    wkb(s"POLYGON(($x $y, ${x + w} $y, ${x + w} ${y + h}, $x ${y + h}, $x $y))")

  /** Two far-apart polygon clusters — distinct xz_chunk directories, so
    * a west mutation must never touch the east chunk's files. */
  private def twoClusters: org.apache.spark.sql.DataFrame =
    ((0 until 20).map(i => (s"w$i", "west", i.toLong, box(-120.0 + i * 0.01, 35.0, 0.3, 0.2))) ++
      (0 until 20).map(i => (s"e$i", "east", i.toLong, box(140.0 + i * 0.01, -20.0, 0.3, 0.2))))
      .toDF("id", "name", "age", "geom")

  private def chunkDirs(root: String, snap: String): Set[String] = {
    val d = new java.io.File(s"$root/data/snapshot=$snap")
    if (!d.exists()) Set.empty
    else d.listFiles().filter(_.isDirectory).map(_.getName).toSet
  }

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select(input_file_name().as("f")).distinct().as[String].collect()
      .map(_.replaceFirst("^file:/*", "/")).toSet

  private def filesUnder(root: String, snap: String, dir: String): Set[String] = {
    val d = new java.io.File(s"$root/data/snapshot=$snap/$dir")
    if (!d.exists()) Set.empty
    else d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSet
  }

  test("deleteWhere on polygons rewrites only the matched chunks; untouched " +
    "chunks resolve to the ORIGINAL files by identical physical path") {
    val root = newRoot()
    GeomTable.write(spark, twoClusters, root, "s1", partitions = 4)
    val s1Dirs = chunkDirs(root, "s1")
    assert(s1Dirs.size >= 2, s"fixture needs >= 2 chunks, got $s1Dirs")

    // delete part of the WEST cluster via a spatial + attribute predicate
    GeomTable.deleteWhere(spark, root, "s1", "s2",
      "BBOX(geom, -121, 34, -119, 36) AND age < 10")

    val westChunks = GeomTable.read(spark, root, "s1")
      .where($"minx" < 0).select("xz_chunk").distinct().as[Long].collect()
      .map(c => s"xz_chunk=$c").toSet
    val s2Dirs = chunkDirs(root, "s2")
    assert(s2Dirs == westChunks, s"s2 rewrote $s2Dirs, expected only $westChunks")

    // untouched (east) chunks: identical physical paths, no copies
    val eastDirs = s1Dirs -- westChunks
    val s1EastFiles = eastDirs.flatMap(d => filesUnder(root, "s1", d))
    val readFiles = scannedFiles(GeomTable.read(spark, root, "s2").where($"minx" > 0))
    assert(readFiles == s1EastFiles,
      s"east rows must come from s1's physical files:\n$readFiles\nvs\n$s1EastFiles")

    // row-level correctness + source-snapshot time travel
    assert(GeomTable.read(spark, root, "s2").count() == 30)
    assert(GeomTable.read(spark, root, "s1").count() == 40)
    // a pruned bbox read over the scoped snapshot still answers exactly
    val east = GeomTable.readBBox(spark, root, "s2", 139.0, -21.0, 142.0, -19.0)
    assert(east.count() == 20)
    assert(scannedFiles(east).forall(f => !f.contains("snapshot=s2/")),
      "east chunk is inherited — the pruned scan must hit only s1 files")
  }

  test("updateWhere re-homes a moved polygon via the mover closure — never " +
    "lost, never duplicated") {
    val root = newRoot()
    GeomTable.write(spark, twoClusters, root, "s1", partitions = 4)
    // move one west polygon INTO the east cluster's chunk
    GeomTable.updateWhere(spark, root, "s1", "s2", "IN ('w0')",
      Map("geom" -> lit(box(140.05, -20.0, 0.3, 0.2))))
    val s2 = GeomTable.read(spark, root, "s2")
    assert(s2.count() == 40)
    val eastRows = s2.where($"minx" > 0)
    assert(eastRows.count() == 21)
    assert(eastRows.where($"id" === "w0").count() == 1)
    assert(s2.where($"id" === "w0").count() == 1, "no duplicate after the move")
    // the moved-into chunk was rewritten under s2 (it gained the mover)
    assert(scannedFiles(eastRows).forall(_.contains("snapshot=s2/")),
      "moved-into chunk must be rewritten under s2")
    // attribute-only update: values apply, geometry-derived keys unchanged
    GeomTable.updateWhere(spark, root, "s2", "s3", "name = 'east'",
      Map("age" -> lit(99L)))
    assert(GeomTable.read(spark, root, "s3").where($"age" === 99L).count() == 20)
  }

  test("upsert replaces existing ids and appends new ones, scoped to the " +
    "touched chunks") {
    val root = newRoot()
    GeomTable.write(spark, twoClusters, root, "s1", partitions = 4)
    val ups = Seq(
      ("w3", "west-upd", 99L, box(-120.0 + 0.03, 35.0, 0.3, 0.2)),
      ("x1", "extra", 7L, box(140.5, -20.0, 0.3, 0.2)))
      .toDF("id", "name", "age", "geom")
    GeomTable.upsert(spark, root, "s1", "s2", ups)
    val s2 = GeomTable.read(spark, root, "s2")
    assert(s2.count() == 41)
    assert(s2.where($"id" === "w3").select("name").as[String].head() == "west-upd")
    assert(s2.where($"id" === "x1").count() == 1)
    // duplicate ids inside one batch are rejected loudly
    intercept[IllegalArgumentException] {
      GeomTable.upsert(spark, root, "s2", "s3",
        Seq(("d1", "a", 1L, box(0, 0, 1, 1)), ("d1", "b", 2L, box(1, 1, 1, 1)))
          .toDF("id", "name", "age", "geom"))
    }
  }

  test("temporal (XZ3) layouts mutate file-granularly too: a one-month delete " +
    "leaves other months' directories referenced, not copied") {
    val root = newRoot()
    val rows = (0 until 60).map { i =>
      val month = 1 + (i % 3)
      (s"id$i", box(10.0 + (i % 10) * 0.01, 20.0, 0.2, 0.2),
        java.sql.Timestamp.valueOf(f"2024-$month%02d-10 12:00:00"))
    }
    GeomTable.write(spark, rows.toDF("id", "geom", "dtg"), root, "s1",
      dtgCol = Some("dtg"), period = "month", partitions = 2)
    GeomTable.deleteWhere(spark, root, "s1", "s2",
      "dtg DURING 2024-02-01T00:00:00.000Z/2024-02-28T23:59:59.000Z")
    val s2 = GeomTable.read(spark, root, "s2")
    assert(s2.count() == 40)
    assert(s2.where(month(col("dtg")) === 2).count() == 0)
    // surviving months physically resolve to s1's files
    val scanned = scannedFiles(s2)
    assert(scanned.nonEmpty && scanned.forall(_.contains("snapshot=s1/")), scanned)
    // the temporal pruned read still answers over the scoped snapshot
    def ms(s: String) = java.sql.Timestamp.valueOf(s).getTime
    assert(GeomTable.readBBoxTime(spark, root, "s2", 9.0, 19.0, 11.0, 21.0,
      ms("2024-01-01 00:00:00"), ms("2024-02-01 00:00:00")).count() == 20)
  }

  test("legacy (pre-chunk) snapshots mutate via the whole-table fallback and " +
    "re-commit in the chunked shape") {
    val root = newRoot()
    GeomTable.write(spark, twoClusters, root, "s1", partitions = 4)
    // forge the legacy manifest shape: no schema / partitions recorded
    // (through the Hadoop FS so the local checksum sidecar stays valid)
    val mPath = new org.apache.hadoop.fs.Path(s"$root/_manifests/s1.json")
    val hfs = mPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = hfs.create(mPath, true)
    out.write("""{"res":12,"period":"week","geom":"geom","dtg":null}""".getBytes("UTF-8"))
    out.close()
    assert(!GeomTable.ginfo(spark, root, "s1").chunked)
    assert(GeomTable.read(spark, root, "s1").count() == 40) // legacy read path
    GeomTable.deleteWhere(spark, root, "s1", "s2", "name = 'west'")
    assert(GeomTable.read(spark, root, "s2").count() == 20)
    assert(GeomTable.ginfo(spark, root, "s2").chunked, "fallback re-commits chunked")
    // and the chunked descendant now mutates scoped
    GeomTable.updateWhere(spark, root, "s2", "s3", "age < 5", Map("age" -> lit(-1L)))
    assert(GeomTable.read(spark, root, "s3").where($"age" === -1L).count() == 5)
  }

  test("attribute index on an extent table: bucket-pruned equality reads, " +
    "delta rebuild under mutations, untouched buckets inherited by path") {
    val root = newRoot()
    // pick an east name whose bucket differs from both sides of the
    // rename, so the untouched-bucket premise holds by construction
    def bucketOf(v: String): Int = spark.sql(
      s"SELECT CAST(pmod(xxhash64('$v'), 8) AS INT)").collect().head.getInt(0)
    val touched = Set(bucketOf("west"), bucketOf("mid"))
    val eastName = (0 until 64).map(i => s"east$i")
      .find(n => !touched.contains(bucketOf(n))).get
    val rows = ((0 until 20).map(i => (s"w$i", "west", i.toLong, box(-120.0 + i * 0.01, 35.0, 0.3, 0.2))) ++
      (0 until 20).map(i => (s"e$i", eastName, i.toLong, box(140.0 + i * 0.01, -20.0, 0.3, 0.2))))
      .toDF("id", "name", "age", "geom")
    GeomTable.write(spark, rows, root, "s1", partitions = 4)
    GeomTable.writeAttributeIndex(spark, root, "s1", "name", buckets = 8)
    assert(GeomTable.indexedColumns(spark, root, "s1") == Map("name" -> Some(8)))
    assert(GeomTable.readByAttribute(spark, root, "s1", "name", "west").count() == 20)
    // bucket pruning: an equality read touches only its hash bucket dir
    val scanned1 = scannedFiles(GeomTable.readByAttribute(spark, root, "s1", "name", "west"))
    assert(scanned1.forall(_.contains(s"attr_bucket=${bucketOf("west")}")), scanned1)

    // rename west -> mid: only the two affected buckets rebuild
    GeomTable.updateWhere(spark, root, "s1", "s2", "name = 'west'",
      Map("name" -> lit("mid")))
    val idxDir = new java.io.File(s"$root/index_name/snapshot=s2")
    val rebuilt = idxDir.listFiles().filter(_.isDirectory).map(_.getName)
      .map(_.stripPrefix("attr_bucket=").toInt).toSet
    assert(rebuilt.subsetOf(touched), s"rebuilt $rebuilt, affected only $touched")
    assert(GeomTable.readByAttribute(spark, root, "s2", "name", "mid").count() == 20)
    assert(GeomTable.readByAttribute(spark, root, "s2", "name", "west").count() == 0)
    assert(GeomTable.readByAttribute(spark, root, "s2", "name", eastName).count() == 20)
    // the untouched bucket's rows physically come from s1's index files
    val eastScan = scannedFiles(GeomTable.readByAttribute(spark, root, "s2", "name", eastName))
    assert(eastScan.forall(_.contains("snapshot=s1/")), eastScan)

    // GC: s2 inherits the east chunk AND the east index bucket from s1
    // — the refs edge set covers index sidecars, so s1 survives
    assert(GeomTable.expireSnapshots(spark, root, keep = Seq("s2")).isEmpty)
    assert(GeomTable.readByAttribute(spark, root, "s2", "name", eastName).count() == 20)

    // upsert keeps the index exact too (replace + append); it touches
    // both chunks and both live buckets, so s3 ends self-contained and
    // the whole history becomes collectible
    GeomTable.upsert(spark, root, "s2", "s3",
      Seq(("w3", "mid", 99L, box(-119.97, 35.0, 0.3, 0.2)),
        ("x1", eastName, 7L, box(140.5, -20.0, 0.3, 0.2)))
        .toDF("id", "name", "age", "geom"))
    assert(GeomTable.readByAttribute(spark, root, "s3", "name", "mid").count() == 20)
    assert(GeomTable.readByAttribute(spark, root, "s3", "name", eastName).count() == 21)
    val expired = GeomTable.expireSnapshots(spark, root, keep = Seq("s3"))
    assert(expired.toSet == Set("s1", "s2"), s"got $expired")
    assert(GeomTable.readByAttribute(spark, root, "s3", "name", eastName).count() == 21)
  }

  test("extent-table stats: collected once, served cached, maintained by " +
    "writer deltas under scoped mutations") {
    val root = newRoot()
    GeomTable.write(spark, twoClusters, root, "s1", partitions = 4)
    TableStats.collectGeom(spark, root, "s1", Seq("name"))
    val st1 = TableStats.cached(spark, root, "s1").get
    assert(st1.count == 40)
    val b1 = st1.bounds.get
    assert(b1._1 == -120.0 && b1._3 > 140.0, s"envelope from extent cols: $b1")
    assert(st1.attributes("name").count == 40)
    // a scoped delete moves the counts EXACTLY without a rescan
    GeomTable.deleteWhere(spark, root, "s1", "s2", "name = 'west' AND age < 10")
    val st2 = TableStats.cached(spark, root, "s2").get
    assert(st2.count == 30 && st2.deleted == 10)
    assert(st2.attributes("name").count == 30)
    // an upsert far outside expands the envelope
    GeomTable.upsert(spark, root, "s2", "s3",
      Seq(("n1", "new", 1L, box(-179.0, -80.0, 0.5, 0.5))).toDF("id", "name", "age", "geom"))
    val st3 = TableStats.cached(spark, root, "s3").get
    assert(st3.count == 31)
    assert(st3.bounds.get._1 == -179.0 && st3.bounds.get._2 == -80.0)
    // getCount/getBounds serve from the sidecar
    assert(TableStats.getCount(spark, root, "s3").contains(31L))
    assert(TableStats.getBounds(spark, root, "s3")._1 == -179.0)
    // the exact fallback routes by table kind (extent manifest), and
    // the estimate reads per-chunk rows from the manifest: a west-bbox
    // estimate is a superset at chunk granularity, zero data I/O
    assert(TableStats.getCount(spark, root, "s3", exact = true).contains(31L))
    // east keeps its 10 age<10 rows (west's were deleted) + upserted n1
    assert(TableStats.getCount(spark, root, "s3", exact = true,
      cql = Some("age < 10")).contains(11L))
    val est = TableStats.estimateCount(spark, root, "s3", (-121.0, 34.0, -119.0, 36.0))
    assert(est >= 10 && est <= 31, s"superset bound at chunk granularity: $est")
  }

  test("an attribute index built on an EMPTY snapshot answers empty, never " +
    "a schema-inference crash") {
    val root = newRoot()
    val empty = Seq.empty[(String, String, Long, Array[Byte])]
      .toDF("id", "name", "age", "geom")
    GeomTable.write(spark, empty, root, "s1", partitions = 2)
    GeomTable.writeAttributeIndex(spark, root, "s1", "name", buckets = 4)
    assert(GeomTable.readByAttribute(spark, root, "s1", "name", "x").count() == 0)
    // the format's indexed route degrades the same way
    val viaFormat = spark.read.format("graft").load(root)
    assert(viaFormat.where($"name" === "x").count() == 0)
  }

  test("expireSnapshots on an extent chain: unreferenced links collect, " +
    "referenced ancestors survive to a fixpoint, kept snapshots answer identically") {
    val root = newRoot()
    GeomTable.write(spark, twoClusters, root, "s1", partitions = 4)
    // s2 rewrites west; s3 rewrites west AGAIN -> s2 is collectible
    // (s3 sources: west -> s3, east -> s1)
    GeomTable.updateWhere(spark, root, "s1", "s2", "name = 'west'",
      Map("age" -> lit(100L)))
    GeomTable.updateWhere(spark, root, "s2", "s3", "name = 'west'",
      Map("age" -> lit(200L)))
    val before = GeomTable.read(spark, root, "s3")
      .select("id", "age").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val expired = GeomTable.expireSnapshots(spark, root, keep = Seq("s3"))
    assert(expired == Seq("s2"), s"expected only s2 collectible, got $expired")
    assert(GeomTable.snapshots(spark, root) == Seq("s1", "s3"))
    assert(!new java.io.File(s"$root/data/snapshot=s2").exists())
    val after = GeomTable.read(spark, root, "s3")
      .select("id", "age").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(after == before && after.count(_._2 == 200L) == 20)
    intercept[IllegalArgumentException](GeomTable.expireSnapshots(spark, root, Seq("nope")))
    // dropTable removes the whole root
    GeomTable.dropTable(spark, root)
    assert(!new java.io.File(root).exists())
  }

  test("chains of scoped mutations stay flattened: every source value is a " +
    "physical holder (one-hop resolution)") {
    val root = newRoot()
    GeomTable.write(spark, twoClusters, root, "s1", partitions = 4)
    GeomTable.deleteWhere(spark, root, "s1", "s2", "IN ('w0')")
    GeomTable.deleteWhere(spark, root, "s2", "s3", "IN ('w1')")
    GeomTable.deleteWhere(spark, root, "s3", "s4", "IN ('e0')")
    assert(GeomTable.read(spark, root, "s4").count() == 37)
    val info = GeomTable.ginfo(spark, root, "s4")
    assert(info.scoped && info.sources.nonEmpty)
    info.sources.foreach { case (k, snap) =>
      assert(new java.io.File(s"$root/data/snapshot=$snap/${k.relpath}").exists(),
        s"dangling source ${k.relpath} -> $snap")
    }
    // time travel intact
    assert(GeomTable.read(spark, root, "s1").count() == 40)
    assert(GeomTable.read(spark, root, "s3").count() == 38)
  }
}
