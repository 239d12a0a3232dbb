package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.table.{SpatialTable, TableStats}

/**
 * The whole table lifecycle as ONE user story (the README "table
 * lifecycle at scale" section, executed): ingest through the format,
 * query through SQL with pushdown, mutate file-granularly, check the
 * writer-maintained stats, expire history, and keep answering — the
 * composition test across the round-4 surfaces.
 */
class TableLifecycleSpec extends AnyFunSuite with SparkTest {

  import spark.implicits._

  test("ingest -> SQL -> mutate -> stats -> expire -> read, end to end") {
    val root = java.nio.file.Files.createTempDirectory("graft_lifecycle").toString

    // 1. ingest through the format front door
    val df = (0 until 300).map { i =>
      (s"f$i", s"cat-${i % 3}", i.toLong, -150.0 + i, (i % 120) - 60.0)
    }.toDF("id", "category", "value", "lon", "lat")
    df.write.format("graft").option("snapshot", "v1").option("id", "id")
      .option("prefixRes", "3").option("salts", "2").save(root)
    SpatialTable.writeAttributeIndex(spark, root, "v1", "category", buckets = 4)
    SpatialTable.writeIdIndex(spark, root, "v1", "id", buckets = 4)
    TableStats.collect(spark, root, "v1", Seq("category"))

    // 2. SQL with pushdown
    spark.sql("DROP TABLE IF EXISTS lifecycle_t")
    spark.sql(s"CREATE TABLE lifecycle_t USING graft OPTIONS (path '$root', id 'id')")
    assert(spark.sql("SELECT count(*) FROM lifecycle_t").head().getLong(0) == 300)
    assert(spark.sql(
      "SELECT count(*) FROM lifecycle_t WHERE category = 'cat-1' AND lon > 0")
      .head().getLong(0) ==
      df.where($"category" === "cat-1" && $"lon" > 0).count())

    // 3. file-granular mutation chain
    SpatialTable.updateWhere(spark, root, "v1", "v2", "category = 'cat-0'",
      Map("value" -> lit(-1L)))
    SpatialTable.deleteWhere(spark, root, "v2", "v3",
      "BBOX(geom, -151, -61, -100, 61)") // drops f0..f50 (lon <= -100, inclusive)
    SpatialTable.upsert(spark, root, "v3", "v4",
      Seq(("extra", "cat-9", 7L, 100.5, 10.5))
        .toDF("id", "category", "value", "lon", "lat"))

    // the format serves the latest snapshot; indexes answer post-chain
    val latest = spark.read.format("graft").load(root)
    assert(latest.count() == 300 - 51 + 1)
    assert(SpatialTable.readByAttribute(spark, root, "v4", "category", "cat-9")
      .count() == 1)
    assert(SpatialTable.readByIds(spark, root, "v4", "id", Seq("extra", "f299"))
      .count() == 2)
    assert(latest.where($"category" === "cat-0" && $"value" =!= -1L).count() == 0)

    // 4. writer-maintained stats moved with the chain (counts exact,
    // cardinality via HLL union sees the new category)
    val st = TableStats.cached(spark, root, "v4").get
    assert(st.count == 250)
    assert(st.attributes("category").cardinality == 4L) // cat-0..2 + cat-9

    // 5. fold the chain into a self-contained snapshot (the compaction
    // pattern persistence drains use), then expire ALL history; the
    // head keeps answering. A scoped head retains every snapshot it
    // still reads files from — transitively, to a fixpoint — so
    // folding first is what makes the entire history collectible.
    // The catalog table pinned its snapshot at creation — REFRESH
    // TABLE picks up external changes, like Spark's own parquet tables
    spark.sql("REFRESH TABLE lifecycle_t")
    SpatialTable.rewrite(spark, root, "v4", "v5",
      identity[org.apache.spark.sql.DataFrame])
    val expired = SpatialTable.expireSnapshots(spark, root, keep = Seq("v5"))
    assert(expired.toSet == Set("v1", "v2", "v3", "v4"),
      s"a folded head frees all history, got $expired")
    spark.sql("REFRESH TABLE lifecycle_t")
    assert(spark.read.format("graft").load(root).count() == 250)
    assert(spark.sql("SELECT count(*) FROM lifecycle_t WHERE category = 'cat-9'")
      .head().getLong(0) == 1)
    spark.sql("DROP TABLE lifecycle_t")
  }
}
