package graft.streaming

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkTest
import ChangelogStream._

/** Changelog semantics (FIXTURES.md §7): keyed upsert visibility, delete
  * removal, watermark-driven TTL expiry, batch replay parity. */
class ChangelogStreamSpec extends AnyFunSuite with SparkTest {

  private def ts(minute: Int): Timestamp = new Timestamp(1700000000000L + minute * 60000L)

  test("batch replay: last-write-wins upserts and delete tombstones") {
    import spark.implicits._
    val events = Seq(
      GeoEvent("upsert", ts(0), "a", 1.0, 1.0, Map("v" -> "1")),
      GeoEvent("upsert", ts(2), "a", 2.0, 2.0, Map("v" -> "2")),
      GeoEvent("upsert", ts(1), "a", 9.0, 9.0, Map("v" -> "stale")), // out of order, older
      GeoEvent("upsert", ts(0), "b", 5.0, 5.0, Map()),
      GeoEvent("delete", ts(3), "b", 0.0, 0.0, Map()),
      GeoEvent("upsert", ts(1), "c", 7.0, 7.0, Map())).toDS()
    val view = ChangelogStream.replay(spark, events).collect().map(s => s.id -> s).toMap
    assert(view.keySet == Set("a", "c"))
    assert(view("a").lon == 2.0 && view("a").attrs("v") == "2")
  }

  test("streaming: upserts and deletes flow through keyed state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[GeoEvent]
    val changes = ChangelogStream.materialize(spark,
      input.toDS().withWatermark("ts", "0 seconds"), ttlMs = 10 * 60000L)
    val q = changes.writeStream.format("memory").queryName("chg1")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        GeoEvent("upsert", ts(0), "a", 1.0, 1.0, Map()),
        GeoEvent("upsert", ts(1), "b", 2.0, 2.0, Map()))
      q.processAllAvailable()
      input.addData(GeoEvent("delete", ts(2), "a", 0.0, 0.0, Map()))
      q.processAllAvailable()
      val out = spark.sql("select * from chg1").collect()
        .map(r => (r.getString(0), r.getString(1)))
      assert(out.count(_ == ("a", "upsert")) == 1)
      assert(out.count(_ == ("b", "upsert")) == 1)
      assert(out.count(_ == ("a", "delete")) == 1)
    } finally q.stop()
  }

  test("streaming: TTL expiry fires when the watermark passes updated+ttl") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[GeoEvent]
    val changes = ChangelogStream.materialize(spark,
      input.toDS().withWatermark("ts", "0 seconds"), ttlMs = 5 * 60000L)
    val q = changes.writeStream.format("memory").queryName("chg2")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(GeoEvent("upsert", ts(0), "old", 1.0, 1.0, Map()))
      q.processAllAvailable()
      // advance the watermark far past old+ttl with a fresh key
      input.addData(GeoEvent("upsert", ts(20), "fresh", 2.0, 2.0, Map()))
      q.processAllAvailable()
      // one more batch so the timeout is evaluated against the new watermark
      input.addData(GeoEvent("upsert", ts(21), "fresh2", 3.0, 3.0, Map()))
      q.processAllAvailable()
      val ops = spark.sql("select * from chg2").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(ops.contains(("old", "expire")), s"no expiry in $ops")
      assert(!ops.contains(("fresh", "expire")))
    } finally q.stop()
  }

  test("persistence job (DataStorePersistence analog): expired features drain " +
    "into the SpatialTable, leave live state, and write-through deletes hold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_lambda_pers").toString
    // bootstrap the persistent tier under a USER id ("s1" sorts AFTER
    // the drain ids "b%09d-a" — the chain head must still follow the
    // drains, not the lexical max)
    graft.table.SpatialTable.write(spark,
      Seq(("boot", 5.0, 5.0, Map("src" -> "bootstrap"), ts(0)))
        .toDF("id", "lon", "lat", "attrs", "updated"),
      root, "s1", "id", "lon", "lat")
    val input = MemoryStream[GeoEvent]
    val changes = ChangelogStream.materialize(spark,
      input.toDS().withWatermark("ts", "0 seconds"), ttlMs = 5 * 60000L)
    val q = changes.writeStream.format("memory").queryName("pers_live")
      .outputMode(OutputMode.Append)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StateChange], id: Long) =>
        // memory sink AND the persistence drain on the same stream: the
        // drain is the foreachBatch, the memory view feeds the asserts
        ChangelogStream.persistenceSink(spark, root)(b, id)
        b.write.mode("append").saveAsTable("pers_live_tbl")
      }
      .start()
    try {
      spark.sql("DROP TABLE IF EXISTS pers_live_tbl")
      spark.sql("CREATE TABLE pers_live_tbl (id STRING, op STRING, lon DOUBLE, " +
        "lat DOUBLE, updated TIMESTAMP, attrs MAP<STRING, STRING>) USING parquet")
      input.addData(GeoEvent("upsert", ts(0), "old", 1.0, 1.0, Map("k" -> "v")))
      q.processAllAvailable()
      // push the watermark past old+ttl, then one more batch to fire it
      input.addData(GeoEvent("upsert", ts(20), "fresh", 2.0, 2.0, Map()))
      q.processAllAvailable()
      input.addData(GeoEvent("upsert", ts(21), "fresh2", 3.0, 3.0, Map()))
      q.processAllAvailable()

      // the expired feature reached the persistent tier WITH its attrs,
      // chained ON TOP of the bootstrap (which stays visible) — i.e.
      // the chain head followed the drain ids, not the lexical max "s1"
      val tier = ChangelogStream.persistentTier(spark, root).collect()
        .map(s => s.id -> s).toMap
      assert(tier.contains("old"), s"expired feature not drained: ${tier.keySet}")
      assert(tier.contains("boot"), s"bootstrap row lost: ${tier.keySet}")
      assert(tier("old").attrs == Map("k" -> "v") && tier("old").lon == 1.0)
      assert(!tier.contains("fresh"), "live feature must not persist early")
      // ...and left the live state (its change stream shows the expire)
      val ops = spark.table("pers_live_tbl").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(ops.contains(("old", "expire")))

      // write-through delete: deleting a persisted feature removes it
      // from the table even after its tombstone would leave the window
      input.addData(GeoEvent("delete", ts(22), "old", 0.0, 0.0, Map()))
      q.processAllAvailable()
      val after = ChangelogStream.persistentTier(spark, root).collect().map(_.id).toSet
      assert(!after.contains("old"), s"write-through delete failed: $after")

      // replaying a committed batch is a no-op (marker idempotence):
      // rerun the sink with the ORIGINAL batch id of the expire drain
      val snapsBefore = graft.table.SpatialTable.snapshots(spark, root)
      val expireBatch = snapsBefore.find(_.endsWith("-a")).get
        .stripPrefix("b").stripSuffix("-a").toLong
      val replay = spark.table("pers_live_tbl").as[StateChange].filter(_.op == "expire")
      ChangelogStream.persistenceSink(spark, root)(replay, expireBatch)
      assert(graft.table.SpatialTable.snapshots(spark, root) == snapsBefore)
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS pers_live_tbl")
    }
  }

  test("drain-chain retention + compaction: a long run leaves a bounded " +
    "snapshot list and a self-contained compacted head that answers everything") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_pers_retain").toString
    // six micro-batches, one expired feature each (all in one cell so
    // every upsert rewrites that prefix — the steady-state drain shape)
    (1 to 6).foreach { b =>
      val batch = Seq(StateChange(s"f$b", "expire", 1.0 + b * 0.001, 1.0, ts(b),
        Map("n" -> b.toString))).toDS()
      ChangelogStream.persistenceSink(spark, root,
        retainSnapshots = 2, compactEvery = 2)(batch, b.toLong)
    }
    val snaps = graft.table.SpatialTable.snapshots(spark, root)
    assert(snaps.size <= 3, s"retention must bound the chain, got $snaps")
    // the compacted head exists and is the chain head
    assert(snaps.contains("b000000006-c"), s"missing compaction fold: $snaps")
    // the head answers EVERY feature ever drained (no history lost to GC)
    val tier = ChangelogStream.persistentTier(spark, root).collect()
      .map(s => s.id -> s.attrs("n")).toMap
    assert(tier == (1 to 6).map(b => s"f$b" -> b.toString).toMap, s"got $tier")
    // bounded files on disk: only live snapshots keep data directories
    val dataDirs = new java.io.File(s"$root/data").listFiles().map(_.getName).toSet
    assert(dataDirs == snaps.map(s => s"snapshot=$s").toSet,
      s"expired snapshots must leave no data dirs: $dataDirs vs $snaps")
    // a compacted head is SELF-CONTAINED: no by-reference sources
    val info = graft.table.SpatialTable.manifestInfo(spark, root, "b000000006-c")
    assert(!info.scoped, "the compaction fold must materialize every prefix")
  }

  test("a delete drain far larger than the old 100k driver bound streams " +
    "through deleteIds without collecting ids") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft_pers_bigdel").toString
    // bootstrap tier: 1000 features
    graft.table.SpatialTable.write(spark,
      spark.range(1000).select(concat(lit("d"), $"id").as("id"),
        (lit(10.0) + $"id" * 0.0001).as("lon"), lit(5.0).as("lat"),
        typedLit(Map.empty[String, String]).as("attrs"),
        lit(ts(0)).as("updated")),
      root, "s1", "id", "lon", "lat")
    // one batch deleting 110k ids (500 present, the rest absent)
    val dels = spark.range(110000)
      .select(concat(lit("d"), ($"id" * 2)).as("id"), lit("delete").as("op"),
        lit(0.0).as("lon"), lit(0.0).as("lat"), lit(ts(1)).as("updated"),
        typedLit(Map.empty[String, String]).as("attrs"))
      .as[StateChange]
    ChangelogStream.persistenceSink(spark, root)(dels, 1L)
    val tier = ChangelogStream.persistentTier(spark, root)
    assert(tier.count() == 500, "every even-numbered feature deleted")
    assert(tier.filter(_.id == "d1").count() == 1)
    assert(tier.filter(_.id == "d2").count() == 0)
  }

  test("lambda merged view: live tier wins, live deletes suppress persistent rows") {
    import spark.implicits._
    val persistent = Seq(
      GeoState("a", 1.0, 1.0, Map.empty, ts(0)),
      GeoState("b", 2.0, 2.0, Map.empty, ts(0)),
      GeoState("c", 3.0, 3.0, Map.empty, ts(0))).toDS()
    val live = Seq(
      GeoEvent("upsert", ts(10), "a", 9.0, 9.0, Map.empty),  // overrides persistent a
      GeoEvent("delete", ts(10), "b", 0.0, 0.0, Map.empty),  // suppresses persistent b
      GeoEvent("upsert", ts(11), "d", 4.0, 4.0, Map.empty)). // new live-only feature
      toDS()
    val merged = ChangelogStream.mergedView(spark, persistent, live)
      .collect().map(s => s.id -> (s.lon, s.lat)).toMap
    assert(merged == Map("a" -> (9.0, 9.0), "c" -> (3.0, 3.0), "d" -> (4.0, 4.0)))
  }

  test("lambda end-to-end: streaming live tier union persistent tier (live wins)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // persistent tier: the long-term store
    val persistent = Seq(
      GeoState("a", 1.0, 1.0, Map.empty, ts(0)),
      GeoState("c", 3.0, 3.0, Map.empty, ts(0))).toDS()
    // live tier: a REAL stream materialized through keyed state
    val input = MemoryStream[GeoEvent]
    val changes = ChangelogStream.materialize(spark,
      input.toDS().withWatermark("ts", "0 seconds"), ttlMs = 60 * 60000L)
    val q = changes.writeStream.format("memory").queryName("lambda_live")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        GeoEvent("upsert", ts(5), "a", 9.0, 9.0, Map.empty), // overrides persistent a
        GeoEvent("upsert", ts(6), "d", 4.0, 4.0, Map.empty)) // live-only
      q.processAllAvailable()
      // read-time merge: reconstruct live events from the emitted change
      // stream, then the lambda union (LambdaQueryRunner semantics)
      val live = spark.sql("select * from lambda_live").as[StateChange]
        .map(c => GeoEvent(if (c.op == "delete" || c.op == "expire") "delete" else "upsert",
          c.updated, c.id, c.lon, c.lat, Map.empty))
      val merged = ChangelogStream.mergedView(spark, persistent, live)
        .collect().map(s => s.id -> (s.lon, s.lat)).toMap
      assert(merged == Map("a" -> (9.0, 9.0), "c" -> (3.0, 3.0), "d" -> (4.0, 4.0)))
    } finally q.stop()
  }

  test("generic stream source (StreamDataStore analog): delimited lines arrive " +
    "as files, a Converter parses them in-stream, the changelog materializes") {
    import spark.implicits._
    import graft.sources.Converters
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_src")
    def writeBatch(name: String, lines: Seq[String]): Unit = {
      val tmp = dir.resolve(s".$name.tmp")
      java.nio.file.Files.write(tmp, lines.mkString("\n").getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, dir.resolve(name), // atomic visibility
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    writeBatch("b0.csv", Seq(
      s"upsert|${ts(0)}|a|1.5|2.5",
      s"upsert|${ts(1)}|b|3.0|4.0",
      "garbage line with no delimiters")) // parse-error skip mode
    val fields = Seq(
      Converters.Field("kind", Converters.Col(0)),
      Converters.Field("ts", Converters.Col(1), castTo = "timestamp"),
      Converters.Field("id", Converters.Col(2)),
      Converters.Field("lon", Converters.Col(3), castTo = "double"),
      Converters.Field("lat", Converters.Col(4), castTo = "double"))
    val parsed = Converters.fromTextStream(spark, dir.toString, fields, delimiter = "|")
    assert(parsed.isStreaming, "converter must run inside the streaming scan")
    val events = parsed
      .where($"kind".isNotNull && $"ts".isNotNull && $"id".isNotNull)
      .withColumn("attrs", org.apache.spark.sql.functions.expr("map()"))
      .selectExpr("kind", "ts", "id", "lon", "lat",
        "CAST(attrs AS MAP<STRING,STRING>) AS attrs")
      .as[GeoEvent]
      .withWatermark("ts", "0 seconds")
    val changes = ChangelogStream.materialize(spark, events.as[GeoEvent], ttlMs = 60 * 60000L)
    val q = changes.writeStream.format("memory").queryName("conv_stream")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      writeBatch("b1.csv", Seq(s"delete|${ts(2)}|a|0.0|0.0"))
      q.processAllAvailable()
      val out = spark.sql("select id, op from conv_stream").collect()
        .map(r => (r.getString(0), r.getString(1)))
      assert(out.count(_ == ("a", "upsert")) == 1)
      assert(out.count(_ == ("b", "upsert")) == 1)
      assert(out.count(_ == ("a", "delete")) == 1)
    } finally q.stop()
  }
}
