package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.StFunctions

/**
 * Density (heatmap) aggregation — the Spark-native reformulation of the
 * reference's DensityScan (geomesa-index-api/.../iterators/
 * DensityScan.scala:30-393): geometries snap to grid cells, weights
 * accumulate per cell, partial aggregation happens map-side for free
 * (Catalyst partial/final agg == the reference's server-side
 * AggregatingScan + client reduce).
 *
 * Points contribute to one cell; extents rasterize to their covering
 * cells via the same cellCover generator the joins use (the reference
 * rasterizes lines with Bresenham and polygons with AWT fill — our grid
 * cover over JTS-intersecting cells computes the same cell set
 * declaratively).
 */
object Density {

  /** Point density: one cell per row. */
  def points(df: DataFrame, lonCol: String, latCol: String, res: Int,
             weight: Option[Column] = None): DataFrame = {
    val cells = df.withColumn("cell", StFunctions.stCellOfXY(col(lonCol), col(latCol), lit(res)))
    agg(cells, weight)
  }

  /** Extent density: explode covering cells, then the same aggregation. */
  def extents(df: DataFrame, geomCol: String, res: Int,
              weight: Option[Column] = None, maxCells: Int = 256): DataFrame = {
    val cells = df.withColumn("cell",
      explode(StFunctions.stCellCover(col(geomCol), lit(res), lit(maxCells))))
    agg(cells, weight)
  }

  /**
   * Viewport density — the reference's DensityScan grid semantics
   * (geomesa-index-api/.../iterators/DensityScan.scala; grid kernel
   * GridSnap, see [[graft.cells.GridSnap]]): a fixed width×height
   * raster over an explicit envelope, rows snapped to cell CENTERS,
   * out-of-envelope rows dropped. The snap is pure Catalyst arithmetic
   * (floor + least — whole-stage codegen, no UDF), so the envelope
   * filter pushes to the scan and the per-cell partial sums combine
   * map-side exactly like the cell-based paths above.
   */
  def grid(df: DataFrame, lonCol: String, latCol: String,
           minX: Double, minY: Double, maxX: Double, maxY: Double,
           width: Int, height: Int, weight: Option[Column] = None): DataFrame = {
    require(width > 0 && height > 0, "grid must have positive dimensions")
    require(maxX > minX && maxY > minY, "envelope must be non-degenerate")
    val dx = (maxX - minX) / width
    val dy = (maxY - minY) / height
    val w = weight.getOrElse(lit(1.0))
    df.where(col(lonCol).between(minX, maxX) && col(latCol).between(minY, maxY))
      .select(
        least(floor((col(lonCol) - lit(minX)) / lit(dx)), lit(width - 1)).cast("int").as("i"),
        least(floor((col(latCol) - lit(minY)) / lit(dy)), lit(height - 1)).cast("int").as("j"),
        w.as("__w"))
      .groupBy("i", "j")
      .agg(count(lit(1)).as("n"), sum(col("__w")).as("weight"))
      .withColumn("x", lit(minX + dx / 2) + lit(dx) * col("i"))
      .withColumn("y", lit(minY + dy / 2) + lit(dy) * col("j"))
  }

  private def agg(cells: DataFrame, weight: Option[Column]): DataFrame = {
    val w = weight.getOrElse(lit(1.0))
    cells.groupBy("cell").agg(
        count(lit(1)).as("n"),
        sum(w).as("weight"))
      .withColumn("tx", StFunctions.stCellX(col("cell")))
      .withColumn("ty", StFunctions.stCellY(col("cell")))
  }
}
