package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.cells.Cells
import graft.functions.StFunctions

/**
 * Raster<->vector tile assignment: map each image footprint (extent) to
 * the hierarchical cells it intersects — the engine's analog of the
 * reference's multi-cell extent indexing (gridIdMapper,
 * GeoMesaSparkSQL.scala:426-440, and the XZ length-selection rule,
 * XZ2SFC.scala:58-74).
 *
 * Resolution-adaptive assignment: an extent is indexed at the deepest
 * resolution whose cell is still >= the extent's max dimension (the XZ
 * rule), clamped to [minRes, maxRes]. Small footprints get fine tiles,
 * large ones coarse tiles — bounding the per-row explode factor, which
 * is what keeps the operator linear at 10^12 rows.
 */
object TileAssign {

  /** Adaptive resolution from the extent's max dimension (XZ rule) —
    * native codegen expression (graft.functions.AdaptiveResWkb), not a
    * boxed ScalaUDF: this runs once per footprint on the 10^12-row
    * ingest path. */
  def adaptiveRes(wkb: Column, minRes: Column, maxRes: Column): Column = {
    import org.apache.spark.sql.graftbridge.{ColumnBridge => EU}
    EU.column(graft.functions.AdaptiveResWkb(
      EU.expression(wkb), EU.expression(minRes.cast("int")), EU.expression(maxRes.cast("int"))))
  }

  /** One output row per (input row, covering tile) at fixed resolution. */
  def atRes(df: DataFrame, geomCol: String, res: Int, maxCells: Int = 64): DataFrame =
    df.withColumn("tile", explode(StFunctions.stCellCover(col(geomCol), lit(res), lit(maxCells))))

  /** Adaptive variant: tile resolution depends on each footprint. */
  def adaptive(df: DataFrame, geomCol: String, minRes: Int, maxRes: Int,
               maxCells: Int = 64): DataFrame =
    df.withColumn("__res", adaptiveRes(col(geomCol), lit(minRes), lit(maxRes)))
      .withColumn("tile", explode(StFunctions.stCellCover(col(geomCol), col("__res"), lit(maxCells))))
      .drop("__res")

  /** Tile-granularity rollup: rows per tile + parent chain for pyramid
    * serving (children/parent algebra instead of re-scanning). */
  def pyramid(tiles: DataFrame, tileCol: String, upToRes: Int): DataFrame = {
    val parentAt = udf { (cell: Long, r: Int) =>
      if (Cells.res(cell) <= r) cell else Cells.parentAt(cell, r)
    }
    tiles.withColumn("__minRes", lit(upToRes))
      .withColumn("tile_parent", parentAt(col(tileCol), col("__minRes")))
      .drop("__minRes")
  }
}
