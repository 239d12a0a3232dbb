package graft.plans

import java.nio.file.Files

import graft.SparkTest
import graft.table.SpatialTable
import org.scalatest.funsuite.AnyFunSuite

/**
 * Port of the reference's AccumuloDataStoreIdlTest
 * (geomesa-accumulo-datastore/src/test/.../data/AccumuloDataStoreIdlTest
 * .scala:29-75): 361 points at (lon, lon/10 integer-division) for lon in
 * -180..180, queried with GeoServer-style BBOXes that wrap the
 * antimeridian or exceed the world — the query-planner literal
 * normalization (trim-to-world, whole-world INCLUDE, dateline split)
 * must produce the reference's exact counts through the indexed store.
 */
class IdlStoreParitySpec extends AnyFunSuite with SparkTest {

  private lazy val root: String = {
    val s = spark
    import s.implicits._
    val r = Files.createTempDirectory("graft-idl").toString
    val df = (-180 to 180).map { lon =>
      (lon.toString, lon.toDouble, (lon / 10).toDouble) // lon/10 is the reference's INT division
    }.toDF("fid", "lon", "lat")
    SpatialTable.write(spark, df, r, "s1", "fid", "lon", "lat")
    r
  }

  private def count(cql: String): Long =
    SpatialTable.queryCql(spark, root, "s1", cql, idColumn = "fid").count()

  test("bigger than earth, multiple IDL-wrapping bbox returns everything") {
    assert(count("BBOX(geom, -230, -110, 230, 110)") === 361)
  }

  test("greater than 180-degree lon diff, non-wrapping bbox") {
    assert(count("BBOX(geom, -100, 1.1, 100, 4.1)") === 30)
  }

  test("small IDL-wrapping bbox pair") {
    assert(count("BBOX(geom, -181.1, -30, -175.1, 30) OR BBOX(geom, 175.1, -30, 181.1, 30)") === 10)
  }

  test("large IDL-wrapping bbox pair") {
    assert(count("BBOX(geom, -181.1, -30, 40.1, 30) OR BBOX(geom, 175.1, -30, 181.1, 30)") === 226)
  }
}
