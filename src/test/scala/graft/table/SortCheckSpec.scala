package graft.table
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest
import graft.images.SyntheticImages
import org.apache.spark.sql.functions._
class SortCheckSpec extends AnyFunSuite with SparkTest {
  test("primary snapshot files are sorted by cell") {
    val d = java.nio.file.Files.createTempDirectory("graft_sortcheck").toString
    val df = SyntheticImages.geoTable(spark, 2000, partitions = 4).drop("bytes")
    SpatialTable.write(spark, df, d, "s1", "image_id", "lon", "lat",
      res = 9, prefixRes = 3, salts = 2, partitions = 4)
    val byFile = spark.read.parquet(s"$d/data/snapshot=s1")
      .select(input_file_name().as("f"), col("cell"))
      .collect().groupBy(_.getString(0))
    val unsorted = byFile.count { case (_, rows) =>
      val cells = rows.map(_.getLong(1)).toSeq
      cells != cells.sorted
    }
    info(s"${byFile.size} files, $unsorted unsorted")
    assert(unsorted == 0, s"$unsorted of ${byFile.size} files not cell-sorted")
  }
}
