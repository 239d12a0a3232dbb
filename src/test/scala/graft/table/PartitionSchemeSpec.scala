package graft.table

import java.time.Instant
import java.time.temporal.ChronoUnit

import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTest
import graft.table.PartitionScheme._

/** Ports the reference's PartitionSchemeTest (geomesa-fs-storage-common/
  * .../PartitionSchemeTest.scala:42-165) and PartitionSchemeConfTest
  * (:25-86) fixtures, then exercises the Spark-native surfaces the
  * reference cannot have: the distributed partition Column (must equal
  * the driver-side name for every row) and partition-pruned reads. */
class PartitionSchemeSpec extends AnyFunSuite with Matchers with SparkTest {

  private val gf = new GeometryFactory()
  private val sft = Sft.parse("test", "name:String,age:Int,dtg:Date,*geom:Point:srid=4326")
  private val dtg = Instant.parse("2017-01-03T10:15:30Z")
  private def feature(lon: Double = 10, lat: Double = 10, when: Instant = dtg): String => Any = {
    case "dtg" => when
    case "geom" => gf.createPoint(new Coordinate(lon, lat))
  }

  // ---- PartitionSchemeTest fixtures -----------------------------------

  test("partition based on date") {
    val ps = DateTimeScheme("yyyy-MM-dd", ChronoUnit.DAYS, 1, "dtg", leaf = true)
    ps.partitionOf(feature()) shouldBe "2017-01-03"
  }

  test("partition based on date with slash delimiter") {
    val ps = DateTimeScheme("yyyy/DDD/HH", ChronoUnit.DAYS, 1, "dtg", leaf = true)
    ps.partitionOf(feature()) shouldBe "2017/003/10"
  }

  test("weekly partitions") {
    val ps = PartitionScheme(sft, "weekly")
    ps shouldBe a[DateTimeScheme]
    ps.partitionOf(feature()) shouldBe "2017/01"
    val tenWeeksOut = Instant.parse("2017-01-01T00:00:00Z").plus(9 * 7 + 1, ChronoUnit.DAYS)
    ps.partitionOf(feature(when = tenWeeksOut)) shouldBe "2017/10"
  }

  test("10 bit datetime z2 partition") {
    val ps = CompositeScheme(Seq(
      DateTimeScheme("yyy/DDD", ChronoUnit.DAYS, 1, "dtg", leaf = true),
      Z2Scheme(10, "geom", leaf = true)))
    ps.partitionOf(feature(10, 10)) shouldBe "2017/003/0770"
    ps.partitionOf(feature(-75, 38)) shouldBe "2017/003/0617"
  }

  test("20 bit datetime z2 partition") {
    val ps = CompositeScheme(Seq(
      DateTimeScheme("yyy/DDD", ChronoUnit.DAYS, 1, "dtg", leaf = true),
      Z2Scheme(20, "geom", leaf = true)))
    ps.partitionOf(feature(10, 10)) shouldBe "2017/003/0789456"
    ps.partitionOf(feature(-75, 38)) shouldBe "2017/003/0632516"
  }

  test("return correct date partitions") {
    val ps = DateTimeScheme("yyyy/DDD/HH", ChronoUnit.HOURS, 1, "dtg", leaf = true)
    val covering = ps.partitionsCql(
      "dtg >= '2016-08-03T00:00:00.000Z' and dtg < '2016-08-04T00:00:00.000Z'")
    covering should have size 24
    covering.head shouldBe "2016/216/00"
    covering.last shouldBe "2016/216/23"
  }

  test("2 bit z2: a dtg-only filter leaves the whole world") {
    val ps = Z2Scheme(2, "geom", leaf = true)
    ps.partitionsCql(
      "dtg >= '2016-08-03T00:00:00.000Z' and dtg < '2016-08-04T00:00:00.000Z'") should have size 4
  }

  test("2 bit z2 with date in a composite") {
    val ps = CompositeScheme(Seq(
      DateTimeScheme("yyy/DDD/HH", ChronoUnit.HOURS, 1, "dtg", leaf = true),
      Z2Scheme(2, "geom", leaf = true)))
    ps.partitionsCql(
      "dtg >= '2016-08-03T00:00:00.000Z' and dtg < '2016-08-04T00:00:00.000Z'") should have size (24 * 4)
  }

  test("2 bit with filter") {
    val ps = Z2Scheme(2, "geom", leaf = true)
    ps.partitionsCql("bbox(geom, -180, -90, 180, 90)") should have size 4
    ps.partitionsCql("bbox(geom, -1, -1, 1, 1)") should have size 4
    ps.partitionsCql("bbox(geom, -10, 5, 10, 6)") should have size 2
  }

  test("4 bit with filter") {
    val ps = Z2Scheme(4, "geom", leaf = true)
    ps.partitionsCql("bbox(geom, -180, -90, 180, 90)") should have size 16
    ps.partitionsCql("bbox(geom, -1, -1, 1, 1)") should have size 4
    ps.partitionsCql("bbox(geom, -10, 5, 10, 6)") should have size 2
    ps.partitionsCql("bbox(geom, -90, 5, 90, 6)") should have size 3
    ps.partitionsCql("bbox(geom, -90.000000001, 5, 90, 6)") should have size 4
    ps.partitionsCql("bbox(geom, -90.000000001, 5, 180, 6)") should have size 4
  }

  test("composite scheme hourly,z2-2bit via the factory") {
    val ps = PartitionScheme(sft, "hourly,z2-2bit")
    ps shouldBe a[CompositeScheme]
    ps.partitionsCql(
      "dtg >= '2016-08-03T00:00:00.000Z' and dtg < '2016-08-04T00:00:00.000Z'") should have size (24 * 4)
  }

  test("handle edge boundaries (exclusive bounds move one second inward)") {
    val ps = DateTimeScheme("yyyy/yyyyMMdd", ChronoUnit.DAYS, 1, "dtg", leaf = true)
    val twoDays = ps.partitionsCql("dtg > '2017-01-02' and dtg < '2017-01-04T00:00:00.000Z'")
    twoDays should contain theSameElementsAs (2 to 3).map(i => f"2017/201701$i%02d")
    val threeDays = ps.partitionsCql("dtg >= '2017-01-02' and dtg <= '2017-01-04T00:00:00.001Z'")
    threeDays should contain theSameElementsAs (2 to 4).map(i => f"2017/201701$i%02d")
  }

  test("cover keeps the upper bound's partition when the lower bound's " +
    "sub-unit offset exceeds it (review regression)") {
    val ps = DateTimeScheme("yyyy/MM/dd", ChronoUnit.DAYS, 1, "dtg", leaf = true)
    // 23:00 -> 01:00 spans three calendar days but between() floors to 1
    val covering = ps.partitionsCql(
      "dtg >= '2017-01-02T23:00:00Z' and dtg <= '2017-01-04T01:00:00Z'")
    covering should contain theSameElementsAs Seq("2017/01/02", "2017/01/03", "2017/01/04")
  }

  test("step > 1 divides the enumeration instead of overshooting the bound") {
    val ps = DateTimeScheme("yyyy/MM/dd", ChronoUnit.DAYS, 7, "dtg", leaf = true)
    val covering = ps.partitionsCql(
      "dtg >= '2017-01-01T00:00:00Z' and dtg <= '2017-01-29T00:00:00Z'")
    // weekly strides 01,08,15,22,29 — never past the upper bound
    covering should contain theSameElementsAs
      Seq("2017/01/01", "2017/01/08", "2017/01/15", "2017/01/22", "2017/01/29")
  }

  test("props-mapped geometry still drives the z2 cover (unalias regression)") {
    val ps = Z2Scheme(4, "geom", leaf = true)
    val props = Map("geom" ->
      graft.functions.StFunctions.fn("st_makePoint")(col("lon"), col("lat")))
    // same bbox as the plain-attribute case: 2 cells, NOT the whole world
    ps.partitionsCql("bbox(geom, -10, 5, 10, 6)", props) should have size 2
  }

  // ---- PartitionSchemeConfTest fixtures -------------------------------

  test("load from conf") {
    val conf =
      """{
        |  "scheme": "datetime,z2",
        |  "options": {
        |    "datetime-format": "yyyy/DDD/HH",
        |    "step-unit": "HOURS",
        |    "step": "1",
        |    "dtg-attribute": "dtg",
        |    "geom-attribute": "geom",
        |    "z2-resolution": "10",
        |    "leaf-storage": "true"
        |  }
        |}""".stripMargin
    val scheme = PartitionScheme.fromConfig(sft, conf)
    scheme shouldBe a[CompositeScheme]
    scheme.partitionOf(feature()) shouldBe "2017/003/10/0770"
  }

  test("load, serialize, deserialize") {
    val scheme = PartitionScheme(sft, "daily,z2-2bit")
    scheme shouldBe a[CompositeScheme]
    val rendered = PartitionScheme.toConfig(scheme)
    val scheme2 = PartitionScheme.fromConfig(sft, rendered)
    scheme2 shouldBe scheme
  }

  test("load dtg, geom, step, and leaf defaults from the sft") {
    val conf =
      """{
        |  "scheme": "datetime,z2",
        |  "options": {
        |    "datetime-format": "yyyy/DDD/HH",
        |    "step-unit": "HOURS",
        |    "z2-resolution": "10"
        |  }
        |}""".stripMargin
    val other = Sft.parse("test", "name:String,age:Int,foo:Date,*bar:Point:srid=4326")
    val scheme = PartitionScheme.fromConfig(other, conf)
    scheme shouldBe a[CompositeScheme]
    scheme.leaf shouldBe true
    scheme.options("geom-attribute") shouldBe "bar"
    scheme.options("dtg-attribute") shouldBe "foo"
    scheme.options("step").toInt shouldBe 1
    scheme.options("leaf-storage").toBoolean shouldBe true
  }

  test("unknown schemes and bad formats fail loudly") {
    an[IllegalArgumentException] should be thrownBy PartitionScheme(sft, "fortnightly")
    an[IllegalArgumentException] should be thrownBy
      DateTimeScheme("yyyy/MM/", ChronoUnit.DAYS, 1, "dtg", leaf = true)
    an[IllegalArgumentException] should be thrownBy
      DateTimeScheme("yyyy-QQ", ChronoUnit.DAYS, 1, "dtg", leaf = true)
    an[IllegalArgumentException] should be thrownBy Z2Scheme(5, "geom", leaf = true)
    an[IllegalArgumentException] should be thrownBy
      PartitionScheme(sft, "daily", Map("dtg-attribute" -> "nope"))
  }

  // ---- Spark-native surfaces ------------------------------------------

  test("partition Column equals the driver-side name for every row") {
    val df = spark.range(0, 500).select(
      col("id"),
      (((col("id") * 7919) % 36000) / 100.0 - 180.0).as("lon"),
      (((col("id") * 104729) % 18000) / 100.0 - 90.0).as("lat"),
      timestamp_seconds(lit(1483228800L) + col("id") * 7200).as("ts"))
    val scheme = CompositeScheme(Seq(
      DateTimeScheme("yyyy/MM/dd", ChronoUnit.DAYS, 1, "ts", leaf = true),
      Z2Scheme(10, "geom", leaf = true)))
    val resolver = LonLatResolver("lon", "lat")
    val rows = df.withColumn("p", scheme.partitionCol(resolver))
      .select("p", "lon", "lat", "ts").collect()
    rows.foreach { r =>
      val expected = scheme.partitionOf {
        case "ts" => r.getTimestamp(3)
        case "geom" => (r.getDouble(1), r.getDouble(2))
      }
      r.getString(0) shouldBe expected
    }
    // weekly column parity on the reference's fixture dates
    val weekly = DateTimeScheme("yyyy/ww", ChronoUnit.WEEKS, 1, "ts", leaf = true)
    val wk = df.limit(50).withColumn("p", weekly.partitionCol(resolver)).select("p", "ts").collect()
    wk.foreach(r => r.getString(0) shouldBe weekly.partitionOf { case "ts" => r.getTimestamp(1) })
  }

  test("write lays out scheme directories; read prunes partitions by the filter") {
    val df = spark.range(0, 1000).select(
      col("id"),
      (((col("id") * 7919) % 36000) / 100.0 - 180.0).as("lon"),
      (((col("id") * 104729) % 18000) / 100.0 - 90.0).as("lat"),
      timestamp_seconds(lit(1483228800L) + col("id") * 7200).as("ts"))
    val scheme = CompositeScheme(Seq(
      DateTimeScheme("yyyy/MM/dd", ChronoUnit.DAYS, 1, "ts", leaf = true),
      Z2Scheme(2, "geom", leaf = true)))
    val resolver = LonLatResolver("lon", "lat")
    val path = "/tmp/graft_pscheme_spec"
    PartitionScheme.write(df, path, scheme, resolver)

    // the layout is the scheme's nested directories
    val root = new java.io.File(path)
    root.listFiles().map(_.getName).filter(_.startsWith("_p0")) should not be empty

    val cql = "ts >= '2017-01-02T00:00:00Z' and ts < '2017-01-04T00:00:00Z' " +
      "and bbox(geom, -179, 0, -1, 89)"
    val props = Map("geom" -> graft.functions.StFunctions.fn("st_makePoint")(col("lon"), col("lat")))
    val pruned = PartitionScheme.read(spark, path, scheme, Some(cql), props)
    val full = PartitionScheme.read(spark, path, scheme).where(
      col("ts") >= "2017-01-02 00:00:00" && col("ts") < "2017-01-04 00:00:00" &&
        col("lon").between(-179, -1) && col("lat").between(0, 89))

    pruned.select("id").collect().map(_.getLong(0)).sorted shouldBe
      full.select("id").collect().map(_.getLong(0)).sorted
    pruned.count() should be > 0L

    // pruning read fewer files than the unpruned store (numFiles is the
    // post-partition-pruning scan metric)
    import org.apache.spark.sql.execution.FileSourceScanExec
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collectLeaves().collect {
        case s: FileSourceScanExec => s.metrics("numFiles").value
      }.sum
    }
    val allFiles = filesRead(PartitionScheme.read(spark, path, scheme))
    filesRead(pruned) should be < allFiles
  }

  test("orc storage: same layout, pruning, and answers as parquet") {
    val df = spark.range(0, 400).select(
      col("id"),
      (((col("id") * 7919) % 36000) / 100.0 - 180.0).as("lon"),
      (((col("id") * 104729) % 18000) / 100.0 - 90.0).as("lat"),
      timestamp_seconds(lit(1483228800L) + col("id") * 7200).as("ts"))
    val scheme = DateTimeScheme("yyyy/MM/dd", ChronoUnit.DAYS, 1, "ts", leaf = true)
    val resolver = LonLatResolver("lon", "lat")
    val path = "/tmp/graft_pscheme_orc_spec"
    PartitionScheme.write(df, path, scheme, resolver, format = "orc")
    new java.io.File(path, "_p0=2017").exists() shouldBe true

    val cql = "ts >= '2017-01-02T00:00:00Z' and ts < '2017-01-04T00:00:00Z'"
    val pruned = PartitionScheme.read(spark, path, scheme, Some(cql), format = "orc")
    val expected = df.where(
      col("ts") >= "2017-01-02 00:00:00" && col("ts") < "2017-01-04 00:00:00")
    pruned.select("id").collect().map(_.getLong(0)).sorted shouldBe
      expected.select("id").collect().map(_.getLong(0)).sorted
    pruned.count() should be > 0L

    an[IllegalArgumentException] should be thrownBy
      PartitionScheme.write(df, path, scheme, resolver, format = "avro")
  }

  // ---- CompactionTest (geomesa-fs-storage-parquet/.../CompactionTest.
  // scala:40-86): each writer session lands its own file; compact merges
  // a partition to a single file with the same rows ---------------------

  // single-partition input: a writer session writes exactly one file
  // (a multi-slice plan with an empty slice 0 would add Spark's forced
  // empty part-00000 sidecar — a plan artifact, not writer semantics)
  private def oneRow(id: Long, name: String, ts: String) =
    spark.range(id, id + 1, 1, 1).select(
      col("id"), lit(name).as("name"), lit(10.0).as("lon"), lit(10.0).as("lat"),
      lit(ts).cast("timestamp").as("ts"))

  test("compact partitions: appends accumulate files, compact merges to one (CompactionTest)") {
    val scheme = DateTimeScheme("yyyy/MM/dd", ChronoUnit.DAYS, 1, "ts", leaf = true)
    val resolver = LonLatResolver("lon", "lat")
    val path = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val partition = "_p0=2017/_p1=01/_p2=01"

    def files = PartitionScheme.partitionFiles(spark, path, scheme)
    def rows = PartitionScheme.read(spark, path, scheme).collect()

    // first feature goes in its own file; second and third in separate files
    Seq("first", "second", "third").zipWithIndex.foreach { case (name, i) =>
      PartitionScheme.append(oneRow(i, name, "2017-01-01 10:00:00"), path, scheme, resolver)
      files(partition) should have size (i + 1).toLong
      rows should have size (i + 1).toLong
    }

    // an already-compact partition on another day is not touched
    PartitionScheme.append(oneRow(9, "other-day", "2017-01-02 10:00:00"), path, scheme, resolver)

    PartitionScheme.compact(spark, path, scheme) shouldBe Seq(partition)
    files(partition) should have size 1
    files("_p0=2017/_p1=01/_p2=02") should have size 1
    rows.map(_.getString(1)).sorted shouldBe Seq("first", "other-day", "second", "third")

    // pruned reads still work over the compacted layout
    val pruned = PartitionScheme.read(spark, path, scheme,
      Some("ts >= '2017-01-01T00:00:00Z' and ts < '2017-01-02T00:00:00Z'"))
    pruned.collect().map(_.getString(1)).sorted shouldBe Seq("first", "second", "third")

    // nothing left to compact: no-op
    PartitionScheme.compact(spark, path, scheme) shouldBe empty
  }

  test("compact with retain ages off expired rows; fully-expired partitions are deleted") {
    val scheme = DateTimeScheme("yyyy/MM/dd", ChronoUnit.DAYS, 1, "ts", leaf = true)
    val resolver = LonLatResolver("lon", "lat")
    val path = java.nio.file.Files.createTempDirectory("graft_ageoff").toString
    // two days, two files each
    PartitionScheme.append(oneRow(0, "old-a", "2017-01-01 01:00:00"), path, scheme, resolver)
    PartitionScheme.append(oneRow(1, "old-b", "2017-01-01 02:00:00"), path, scheme, resolver)
    PartitionScheme.append(oneRow(2, "new-a", "2017-01-02 01:00:00"), path, scheme, resolver)
    PartitionScheme.append(oneRow(3, "new-b", "2017-01-02 02:00:00"), path, scheme, resolver)

    val compacted = PartitionScheme.compact(spark, path, scheme,
      retain = Some(col("ts") >= lit("2017-01-02 00:00:00").cast("timestamp")))
    compacted.sorted shouldBe Seq("_p0=2017/_p1=01/_p2=01", "_p0=2017/_p1=01/_p2=02")

    val files = PartitionScheme.partitionFiles(spark, path, scheme)
    files.keySet shouldBe Set("_p0=2017/_p1=01/_p2=02") // expired day removed
    files("_p0=2017/_p1=01/_p2=02") should have size 1
    PartitionScheme.read(spark, path, scheme).collect()
      .map(_.getString(1)).sorted shouldBe Seq("new-a", "new-b")
  }

  test("a crashed compaction swap heals from its journal on the next compact " +
    "(no permanent duplicates, no lost rows)") {
    val scheme = DateTimeScheme("yyyy/MM/dd", ChronoUnit.DAYS, 1, "ts", leaf = true)
    val resolver = LonLatResolver("lon", "lat")
    val path = java.nio.file.Files.createTempDirectory("graft_heal").toString
    val partition = "_p0=2017/_p1=01/_p2=01"
    PartitionScheme.append(oneRow(0, "keep", "2017-01-01 10:00:00"), path, scheme, resolver)
    PartitionScheme.append(oneRow(1, "stale", "2017-01-01 11:00:00"), path, scheme, resolver)

    // simulate a compaction that wrote its output and its journal, then
    // crashed before the swap: tmp holds the compacted file (here: a
    // copy of the "keep" file), the journal lists BOTH old files for
    // deletion — replay must move the new file in, delete the old ones,
    // and remove tmp + journal
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val all = PartitionScheme.partitionFiles(spark, path, scheme)
    val rows = PartitionScheme.read(spark, path, scheme).collect()
    rows should have size 2
    val keepFile = {
      // identify which data file holds "keep" (id 0) by reading each
      val byFile = all(partition).map { f =>
        f -> spark.read.parquet(f.toString).collect().map(_.getString(1)).toSeq
      }
      byFile.collectFirst { case (f, vs) if vs == Seq("keep") => f }.get
    }
    val tmpDir = new org.apache.hadoop.fs.Path(path, ".compact-heal-test")
    val tmpPart = new org.apache.hadoop.fs.Path(tmpDir, partition)
    fs.mkdirs(tmpPart)
    org.apache.hadoop.fs.FileUtil.copy(fs, keepFile, fs,
      new org.apache.hadoop.fs.Path(tmpPart, "part-compacted.parquet"),
      false, spark.sparkContext.hadoopConfiguration)
    val journal =
      s"""{"tmp":".compact-heal-test","partitions":["$partition"],
         |"deletes":[${all(partition).map(p => "\"" + p + "\"").mkString(",")}],
         |"dropDirs":[]}""".stripMargin.replace("\n", "")
    val jPath = new org.apache.hadoop.fs.Path(path, ".compact-journal-heal.json")
    val out = fs.create(jPath, true)
    out.write(journal.getBytes("UTF-8")); out.close()

    // next compact heals FIRST (and then finds nothing multi-file to do)
    PartitionScheme.compact(spark, path, scheme) shouldBe empty
    fs.exists(jPath) shouldBe false
    fs.exists(tmpDir) shouldBe false
    PartitionScheme.partitionFiles(spark, path, scheme)(partition) should have size 1
    PartitionScheme.read(spark, path, scheme).collect()
      .map(_.getString(1)) shouldBe Array("keep")

    // an uncommitted .tmp journal (crash before journal commit) is swept
    val staged = new org.apache.hadoop.fs.Path(path, ".compact-journal-x.tmp")
    val o2 = fs.create(staged, true); o2.write("{".getBytes("UTF-8")); o2.close()
    PartitionScheme.compact(spark, path, scheme) shouldBe empty
    fs.exists(staged) shouldBe false
  }

  test("compact a flat scheme merges the root's files in place") {
    val scheme = FlatScheme
    val path = java.nio.file.Files.createTempDirectory("graft_compact_flat").toString
    PartitionScheme.append(oneRow(0, "a", "2017-01-01 10:00:00"), path, scheme)
    PartitionScheme.append(oneRow(1, "b", "2017-01-01 11:00:00"), path, scheme)
    PartitionScheme.partitionFiles(spark, path, scheme)("") should have size 2
    PartitionScheme.compact(spark, path, scheme) shouldBe Seq("")
    PartitionScheme.partitionFiles(spark, path, scheme)("") should have size 1
    PartitionScheme.read(spark, path, scheme).collect()
      .map(_.getString(1)).sorted shouldBe Seq("a", "b")
  }
}
