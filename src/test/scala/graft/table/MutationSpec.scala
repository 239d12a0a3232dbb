package graft.table

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTest

/** Feature mutation semantics — the FeatureWriter / removeFeatures /
  * removeSchema surface, ported from the reference's
  * AccumuloFeatureWriterTest (update preserving fids :52-92, replace-all
  * :94-120, update-by-ecql :122-142, remove :143-171, geometry change
  * re-indexes :229-264, delete+add same key :353-398) and
  * AccumuloDataStoreDeleteTest (remove schema :52-78, separate schemas
  * survive :80-123). Mutations are copy-on-write snapshot rewrites:
  * derived cells and every secondary layout rebuild, so all indices stay
  * consistent by construction. */
class MutationSpec extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private def freshRoot(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val people = Seq(
    ("fid1", "will", 56L, 45.0, 49.0),
    ("fid2", "george", 33L, 45.0, 49.0),
    ("fid3", "sue", 99L, 45.0, 49.0),
    ("fid4", "karen", 50L, 45.0, 49.0),
    ("fid5", "bob", 56L, 45.0, 49.0))

  private def writePeople(root: String): Unit = {
    val df = people.toDF("id", "name", "age", "lon", "lat")
    SpatialTable.write(spark, df, root, "s1", "id", "lon", "lat",
      res = 9, prefixRes = 3, salts = 2, partitions = 2)
    SpatialTable.writeAttributeIndex(spark, root, "s1", "name", buckets = 4)
    SpatialTable.writeIdIndex(spark, root, "s1", "id", buckets = 4)
  }

  private def namesAndIds(root: String, snap: String): Set[(String, String)] =
    SpatialTable.read(spark, root, snap).select("name", "id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet

  test("modify + remove: turn fred into billy, delete kyle; ids preserved " +
    "(AccumuloFeatureWriterTest:52-92)") {
    val root = freshRoot("graft_mut1")
    val df = Seq(("id1", "fred", 50L, 45.0, 49.0), ("id2", "tom", 60L, 45.0, 49.0),
      ("id3", "kyle", 2L, 45.0, 49.0)).toDF("id", "name", "age", "lon", "lat")
    SpatialTable.write(spark, df, root, "s1", "id", "lon", "lat",
      res = 9, prefixRes = 3, salts = 1, partitions = 1)

    SpatialTable.updateWhere(spark, root, "s1", "s2", "name = 'fred'",
      Map("name" -> lit("billy"), "age" -> lit(25L)))
    SpatialTable.deleteWhere(spark, root, "s2", "s3", "name = 'kyle'")

    val out = SpatialTable.read(spark, root, "s3").select("name", "age", "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(out == Set(("tom", 60L, "id2"), ("billy", 25L, "id1")))
    // the source snapshots are untouched (time travel)
    assert(namesAndIds(root, "s1") == Set("fred" -> "id1", "tom" -> "id2", "kyle" -> "id3"))
  }

  test("update all features based on some ecql; fids preserved " +
    "(AccumuloFeatureWriterTest:122-142)") {
    val root = freshRoot("graft_mut2")
    writePeople(root)
    SpatialTable.updateWhere(spark, root, "s1", "s2",
      "(age > 50 AND age < 99) or (name = 'karen')", Map("age" -> lit(60L)))
    val updated = SpatialTable.queryCql(spark, root, "s2", "age = 60")
      .select("name", "id").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(updated == Set("will" -> "fid1", "karen" -> "fid4", "bob" -> "fid5"))
    // untouched rows keep their values
    assert(SpatialTable.queryCql(spark, root, "s2", "name = 'sue'")
      .select("age").as[Long].head() == 99L)
  }

  test("remove features by filter; null attributes are not matched " +
    "(AccumuloFeatureWriterTest:143-171)") {
    val root = freshRoot("graft_mut3")
    val df = people.toDF("id", "name", "age", "lon", "lat")
      .unionByName(Seq(("fid6", null.asInstanceOf[String], 1L, 45.0, 49.0))
        .toDF("id", "name", "age", "lon", "lat"))
    SpatialTable.write(spark, df, root, "s1", "id", "lon", "lat",
      res = 9, prefixRes = 3, salts = 1, partitions = 1)
    SpatialTable.deleteWhere(spark, root, "s1", "s2", "name = 'will' or name = 'sue'")
    val left = SpatialTable.read(spark, root, "s2").select("id").as[String].collect().toSet
    // fid6's null name evaluates NULL under the filter — it must survive
    assert(left == Set("fid2", "fid4", "fid5", "fid6"))
  }

  test("upsert: existing fids replace, new fids append; delete-and-add the " +
    "same key works (AccumuloFeatureWriterTest:52-120,353-398)") {
    val root = freshRoot("graft_mut4")
    writePeople(root)
    val updates = Seq(
      ("fid1", "will2", 57L, 46.0, 48.0), // same key, new attrs + new geom
      ("fid9", "nina", 20L, 45.0, 49.0)   // brand-new key
    ).toDF("id", "name", "age", "lon", "lat")
    SpatialTable.upsert(spark, root, "s1", "s2", updates)
    val out = namesAndIds(root, "s2")
    assert(out == Set("will2" -> "fid1", "george" -> "fid2", "sue" -> "fid3",
      "karen" -> "fid4", "bob" -> "fid5", "nina" -> "fid9"))
    assert(SpatialTable.read(spark, root, "s2").count() == 6)

    // delete fid1 then add it back under the same key: exactly one row
    SpatialTable.deleteWhere(spark, root, "s2", "s3", "IN ('fid1')")
    assert(!namesAndIds(root, "s3").exists(_._2 == "fid1"))
    SpatialTable.upsert(spark, root, "s3", "s4",
      Seq(("fid1", "will3", 58L, 45.0, 49.0)).toDF("id", "name", "age", "lon", "lat"))
    val fid1 = SpatialTable.read(spark, root, "s4").where($"id" === "fid1").collect()
    assert(fid1.length == 1)
  }

  test("a moved geometry re-indexes: old location finds nothing, new one finds " +
    "the feature, through the pruned spatial path (AccumuloFeatureWriterTest:229-264)") {
    val root = freshRoot("graft_mut5")
    writePeople(root)
    // move will from (45, 49) to (-100, 30)
    SpatialTable.updateWhere(spark, root, "s1", "s2", "name = 'will'",
      Map("lon" -> lit(-100.0), "lat" -> lit(30.0)))
    val oldBox = SpatialTable.readBBox(spark, root, "s2", (44.0, 48.0, 46.0, 50.0))
      .select("name").as[String].collect().toSet
    assert(oldBox == Set("george", "sue", "karen", "bob"))
    val newBox = SpatialTable.readBBox(spark, root, "s2", (-101.0, 29.0, -99.0, 31.0))
      .select("name").as[String].collect().toSet
    assert(newBox == Set("will"))
    // the rebuilt cells really moved (not just the lon/lat columns)
    val cells = SpatialTable.read(spark, root, "s2").where($"name" === "will")
      .select("cell").as[Long].collect()
    val others = SpatialTable.read(spark, root, "s1").where($"name" === "will")
      .select("cell").as[Long].collect()
    assert(cells.head != others.head)
  }

  test("mutations rebuild every committed secondary layout consistently") {
    val root = freshRoot("graft_mut6")
    writePeople(root)
    SpatialTable.updateWhere(spark, root, "s1", "s2", "name = 'will'",
      Map("name" -> lit("wilma")))
    // attr + id layouts exist for s2 with the same bucket counts
    assert(SpatialTable.indexedColumns(spark, root, "s2") ==
      Map("name" -> Some(4), "id" -> Some(4)))
    // the attribute index answers with the NEW value and not the old
    assert(SpatialTable.readByAttribute(spark, root, "s2", "name", "wilma")
      .select("id").as[String].collect().toSeq == Seq("fid1"))
    assert(SpatialTable.readByAttribute(spark, root, "s2", "name", "will").count() == 0)
    // id lookups route through the rebuilt id layout
    assert(SpatialTable.readByIds(spark, root, "s2", "id", Seq("fid1"))
      .select("name").as[String].head() == "wilma")
    // index commit markers never masquerade as snapshots, and the
    // evolved all-snapshots view still resolves (it lists by snapshot id)
    assert(SpatialTable.snapshots(spark, root) == Seq("s1", "s2"))
    assert(SpatialTable.readAll(spark, root).count() == 10)
  }

  test("drop table removes everything; separate roots survive " +
    "(AccumuloDataStoreDeleteTest:52-123)") {
    val rootA = freshRoot("graft_dropA")
    val rootB = freshRoot("graft_dropB")
    writePeople(rootA)
    writePeople(rootB)
    assert(SpatialTable.snapshots(spark, rootA) == Seq("s1"))

    SpatialTable.dropTable(spark, rootA)
    assert(!new java.io.File(rootA).exists())
    assert(SpatialTable.snapshots(spark, rootA).isEmpty)
    intercept[Exception](SpatialTable.read(spark, rootA, "s1").collect())

    // the other table is untouched and still answers
    assert(SpatialTable.snapshots(spark, rootB) == Seq("s1"))
    assert(namesAndIds(rootB, "s1").size == 5)
  }

  test("rewrite guards: same-id target and uncommitted source are refused") {
    val root = freshRoot("graft_mut7")
    writePeople(root)
    intercept[IllegalArgumentException](
      SpatialTable.deleteWhere(spark, root, "s1", "s1", "name = 'will'"))
    intercept[IllegalArgumentException](
      SpatialTable.deleteWhere(spark, root, "nope", "s2", "name = 'will'"))
    intercept[IllegalArgumentException](
      SpatialTable.updateWhere(spark, root, "s1", "s2", "name = 'will'", Map.empty))
    intercept[IllegalArgumentException](
      SpatialTable.upsert(spark, root, "s1", "s2",
        Seq(("fid1", "x")).toDF("id", "name"))) // schema mismatch
  }

  test("upsert rejects duplicate ids within one batch (unordered rows make " +
    "last-wins undefined — never commit duplicate feature ids)") {
    val root = freshRoot("graft_mut8")
    writePeople(root)
    val dup = Seq(
      ("fid1", "a", 1L, 45.0, 49.0),
      ("fid1", "b", 2L, 45.0, 49.0)).toDF("id", "name", "age", "lon", "lat")
    val e = intercept[IllegalArgumentException](
      SpatialTable.upsert(spark, root, "s1", "s2", dup))
    assert(e.getMessage.contains("duplicate ids"))
  }

  test("mutating a temporal snapshot keeps the temporal layout and " +
    "re-derives time_bin from the updated dtg") {
    val root = freshRoot("graft_mut9")
    val df = Seq(
      ("id1", 10.0, 10.0, "2024-01-02 12:00:00"),
      ("id2", 10.0, 10.0, "2024-01-05 12:00:00"),
      ("id3", 10.0, 10.0, "2024-03-20 12:00:00"))
      .toDF("id", "lon", "lat", "d")
      .withColumn("dtg", $"d".cast("timestamp")).drop("d")
    SpatialTable.writeTemporal(spark, df, root, "s1", "id", "lon", "lat", "dtg",
      period = "day", res = 9, prefixRes = 3, salts = 1, partitions = 2)

    // move id1 two months forward — its time_bin directory must move too
    SpatialTable.updateWhere(spark, root, "s1", "s2", "IN ('id1')",
      Map("dtg" -> lit("2024-03-10 12:00:00").cast("timestamp")))

    def names(startMs: Long, endMs: Long): Set[String] =
      SpatialTable.readBBoxTime(spark, root, "s2", (9.0, 9.0, 11.0, 11.0),
        startMs, endMs).select("id").as[String].collect().toSet
    def ms(s: String): Long = java.sql.Timestamp.valueOf(s).getTime
    // the January window no longer finds id1; the March window does
    assert(names(ms("2024-01-01 00:00:00"), ms("2024-02-01 00:00:00")) == Set("id2"))
    assert(names(ms("2024-03-01 00:00:00"), ms("2024-04-01 00:00:00")) == Set("id1", "id3"))
    // time_bin is re-derived, not stale: id1's bin equals the bin its NEW
    // dtg falls in (id3's March bins are nearby; id2's January bin is not)
    val bins = SpatialTable.read(spark, root, "s2")
      .select("id", "time_bin").collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val p = graft.cells.BinnedTime.period("day")
    assert(bins("id1") == graft.cells.BinnedTime.toBinned(p, ms("2024-03-10 12:00:00")).bin.toInt)
    assert(bins("id2") == graft.cells.BinnedTime.toBinned(p, ms("2024-01-05 12:00:00")).bin.toInt)
  }

  test("mutation rebuilds a tiered attribute index with its tier preserved") {
    val root = freshRoot("graft_mut10")
    val df = Seq(
      ("id1", "will", 45.0, 49.0, "2024-01-02 12:00:00"),
      ("id2", "sue", 45.0, 49.0, "2024-01-05 12:00:00"))
      .toDF("id", "name", "lon", "lat", "d")
      .withColumn("dtg", $"d".cast("timestamp")).drop("d")
    SpatialTable.write(spark, df, root, "s1", "id", "lon", "lat",
      res = 9, prefixRes = 3, salts = 1, partitions = 1)
    SpatialTable.writeAttributeIndex(spark, root, "s1", "name", buckets = 4,
      tierCol = Some("dtg"))
    assert(SpatialTable.indexTier(spark, root, "s1", "name").contains("dtg"))
    assert(SpatialTable.indexBuckets(spark, root, "s1", "name").contains(4))

    SpatialTable.deleteWhere(spark, root, "s1", "s2", "name = 'sue'")
    // the rebuilt index keeps both the bucket count and the tier sort
    assert(SpatialTable.indexTier(spark, root, "s2", "name").contains("dtg"))
    assert(SpatialTable.indexBuckets(spark, root, "s2", "name").contains(4))
    assert(SpatialTable.readByAttribute(spark, root, "s2", "name", "will").count() == 1)
  }
}
