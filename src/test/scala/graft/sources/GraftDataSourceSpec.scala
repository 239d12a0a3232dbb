package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTest
import graft.table.SpatialTable

/**
 * The `format("graft")` front door (GeoMesaSparkSQL.scala:64-95 UX):
 * one-liner reads with pushdown parity against the programmatic path,
 * `CREATE TABLE ... USING graft`, and the write path.
 */
class GraftDataSourceSpec extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft_fmt").toString
    val rnd = new scala.util.Random(7)
    val df = (0 until 500).map { i =>
      (s"f$i", s"name-${i % 5}", rnd.nextDouble() * 300 - 150, rnd.nextDouble() * 160 - 80)
    }.toDF("id", "name", "lon", "lat")
    SpatialTable.write(spark, df, r, "s1", "id", "lon", "lat",
      res = 9, prefixRes = 3, salts = 2, partitions = 4)
    r
  }

  test("format read equals the programmatic read (latest snapshot by default)") {
    val viaFormat = spark.read.format("graft").load(root)
    val direct = SpatialTable.read(spark, root, "s1")
    assert(viaFormat.schema == direct.schema)
    assert(viaFormat.count() == 500)
    assert(viaFormat.select("id").as[String].collect().sorted.toSeq ==
      direct.select("id").as[String].collect().sorted.toSeq)
  }

  test("relational filters push down (PushedFilters on the scan) and results " +
    "match re-filtering the direct read") {
    val q = spark.read.format("graft").option("snapshot", "s1").load(root)
      .where($"name" === "name-2" && $"lon" > 0.0)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("EqualTo(name,name-2)"), plan)
    val expect = SpatialTable.read(spark, root, "s1")
      .where($"name" === "name-2" && $"lon" > 0.0).count()
    assert(q.count() == expect && expect > 0)
  }

  test("a conjunctive lon/lat box routes through the pruned bbox path: " +
    "fewer bytes read than the full scan, same rows as the exact filter") {
    def bytesOf[T](body: => T): (Long, T) = {
      // accumulate task-level input bytes while the body runs
      val acc = new java.util.concurrent.atomic.AtomicLong
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null) acc.addAndGet(e.taskMetrics.inputMetrics.bytesRead)
      }
      spark.sparkContext.addSparkListener(l)
      val r = body
      // flush the async listener bus with a no-input job + a short wait
      spark.sparkContext.parallelize(Seq(1)).count()
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(l)
      (acc.get(), r)
    }
    val box = ($"lon" >= 10.0 && $"lon" <= 30.0 && $"lat" >= 10.0 && $"lat" <= 30.0)
    val (bBox, nBox) = bytesOf(
      spark.read.format("graft").load(root).where(box).count())
    val (bAll, nAll) = bytesOf(
      spark.read.format("graft").load(root).count())
    val exact = SpatialTable.read(spark, root, "s1").where(box).count()
    assert(nBox == exact && nAll == 500)
    assert(bBox < bAll, s"bbox path should read fewer bytes: $bBox vs $bAll")
  }

  test("CREATE TABLE ... USING graft answers SQL with pushdown") {
    spark.sql("DROP TABLE IF EXISTS fmt_events")
    spark.sql(s"CREATE TABLE fmt_events USING graft OPTIONS (path '$root', snapshot 's1')")
    val out = spark.sql(
      "SELECT id FROM fmt_events WHERE name = 'name-1' AND lat BETWEEN -10 AND 10")
    val expect = SpatialTable.read(spark, root, "s1")
      .where($"name" === "name-1" && $"lat".between(-10, 10)).count()
    assert(out.count() == expect)
    spark.sql("DROP TABLE fmt_events")
  }

  test("cql option compiles an ECQL filter into the scan") {
    val out = spark.read.format("graft")
      .option("cql", "BBOX(geom, -50, -50, 50, 50) AND name = 'name-3'")
      .load(root)
    val expect = SpatialTable.queryCql(spark, root, "s1",
      "BBOX(geom, -50, -50, 50, 50) AND name = 'name-3'")
    assert(out.count() == expect.count())
  }

  test("write path: save creates a committed snapshot; immutability is enforced") {
    val r2 = java.nio.file.Files.createTempDirectory("graft_fmt_w").toString
    val df = Seq(("a", 1.0, 2.0), ("b", 3.0, 4.0)).toDF("id", "lon", "lat")
    df.write.format("graft").option("snapshot", "w1").option("id", "id").save(r2)
    assert(SpatialTable.isCommitted(spark, r2, "w1"))
    assert(spark.read.format("graft").load(r2).count() == 2)
    // default ErrorIfExists refuses to clobber a committed snapshot
    intercept[IllegalArgumentException](
      df.write.format("graft").option("snapshot", "w1").option("id", "id").save(r2))
    // Ignore no-ops; Overwrite replaces
    df.write.format("graft").mode("ignore")
      .option("snapshot", "w1").option("id", "id").save(r2)
    df.limit(1).write.format("graft").mode("overwrite")
      .option("snapshot", "w1").option("id", "id").save(r2)
    assert(spark.read.format("graft").load(r2).count() == 1)
  }

  test("temporal layout through the format: dtg option writes (time_bin, " +
    "cell_prefix) directories and pushed dtg bounds prune whole time bins") {
    val r4 = java.nio.file.Files.createTempDirectory("graft_fmt_t").toString
    val rows = (0 until 60).map { i =>
      val month = 1 + (i % 3)
      (s"id$i", 10.0 + (i % 10) * 0.01, 20.0,
        java.sql.Timestamp.valueOf(f"2024-$month%02d-10 12:00:00"))
    }
    rows.toDF("id", "lon", "lat", "dtg").write.format("graft")
      .option("snapshot", "t1").option("id", "id")
      .option("dtg", "dtg").option("period", "month").save(r4)
    assert(new java.io.File(s"$r4/data/snapshot=t1").listFiles()
      .exists(_.getName.startsWith("time_bin=")))
    val q = spark.read.format("graft").load(r4)
      .where($"dtg" >= java.sql.Timestamp.valueOf("2024-02-01 00:00:00") &&
        $"dtg" < java.sql.Timestamp.valueOf("2024-03-01 00:00:00"))
    assert(q.count() == 20)
    // only February's directory is scanned (bin pruning from the pushed
    // dtg bounds)
    val feb = graft.cells.BinnedTime.toBinned(
      graft.cells.BinnedTime.period("month"),
      java.sql.Timestamp.valueOf("2024-02-10 12:00:00").getTime).bin.toInt
    val scanned = q.select(input_file_name().as("f")).distinct().as[String].collect()
    assert(scanned.nonEmpty && scanned.forall(_.contains(s"time_bin=$feb/")),
      scanned.mkString("\n"))
  }

  test("scoped-mutation snapshots resolve through the format") {
    val r3 = java.nio.file.Files.createTempDirectory("graft_fmt_m").toString
    val df = (0 until 100).map(i => (s"p$i", -100.0 + i, (i % 80) - 40.0))
      .toDF("id", "lon", "lat")
    SpatialTable.write(spark, df, r3, "s1", "id", "lon", "lat",
      res = 9, prefixRes = 3, salts = 1, partitions = 2)
    SpatialTable.deleteWhere(spark, r3, "s1", "s2", "IN ('p0')")
    assert(spark.read.format("graft").load(r3).count() == 99) // latest = s2
    assert(spark.read.format("graft").option("snapshot", "s1").load(r3).count() == 100)
    // overwriting s1 is refused: s2 references s1's physical files
    val e = intercept[IllegalArgumentException](
      df.limit(1).write.format("graft").mode("overwrite")
        .option("snapshot", "s1").option("id", "id").save(r3))
    assert(e.getMessage.contains("reference its files"), e.getMessage)
    assert(spark.read.format("graft").option("snapshot", "s2").load(r3).count() == 99)
  }

  test("overwrite drops index layouts and stats with the snapshot (nothing " +
    "stale answers for the rewritten id)") {
    val r5 = java.nio.file.Files.createTempDirectory("graft_fmt_ow").toString
    val df = (0 until 50).map(i => (s"p$i", s"n${i % 5}", -10.0 + i, 0.0))
      .toDF("id", "name", "lon", "lat")
    SpatialTable.write(spark, df, r5, "s1", "id", "lon", "lat",
      res = 9, prefixRes = 3, salts = 1, partitions = 2)
    SpatialTable.writeAttributeIndex(spark, r5, "s1", "name", buckets = 4)
    graft.table.TableStats.collect(spark, r5, "s1", Seq("name"))
    // rewrite s1 through the format with a 2-row frame
    Seq(("x1", "zz", 1.0, 1.0), ("x2", "zz", 2.0, 2.0))
      .toDF("id", "name", "lon", "lat")
      .write.format("graft").mode("overwrite")
      .option("snapshot", "s1").option("id", "id").save(r5)
    assert(spark.read.format("graft").load(r5).count() == 2)
    // the old index layout + marker + stats are gone — no stale answers
    assert(SpatialTable.indexedColumns(spark, r5, "s1").isEmpty)
    assert(!new java.io.File(s"$r5/index_name/snapshot=s1").exists())
    assert(graft.table.TableStats.cached(spark, r5, "s1").isEmpty)
  }
}
