package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Whole-stage-codegen spatial operators for axis-aligned boxes.
 *
 * The generic operators (SpatialJoin/TileAssign) take WKB geometry and
 * run JTS inside ScalaUDFs — correct for arbitrary shapes, but each call
 * crosses the codegen boundary and allocates. When both sides are AABBs
 * (image footprints, tile/zone boxes — the flagship pipeline's case),
 * the same cell equi-join + refine + ownership-dedup plan compiles to
 * pure Column arithmetic: `sequence`/`explode` for the cover,
 * comparisons for the overlap refine, `greatest/floor` for the
 * reference-corner owner cell, and shift/or folds for the Morton tile
 * id. Everything stays inside WholeStageCodegen — no UDF, no JTS, no
 * per-row allocation — which is what keeps 4x-core scaling near-linear.
 */
object BoxOps {

  private def ix(lon: Column, n: Long): Column =
    least(lit(n - 1), greatest(lit(0L), floor((lon + 180.0) / 360.0 * n).cast("long")))
  private def iy(lat: Column, n: Long): Column =
    least(lit(n - 1), greatest(lit(0L), floor((lat + 90.0) / 180.0 * n).cast("long")))

  /** Morton interleave as a codegen Column fold (matches Cells.pack). */
  def mortonColumn(tx: Column, ty: Column, res: Int): Column = {
    val terms = (0 until res).flatMap { i =>
      Seq(shiftleft(tx.bitwiseAND(lit(1L << i)), i),       // bit i -> 2i
          shiftleft(ty.bitwiseAND(lit(1L << i)), i + 1))   // bit i -> 2i+1
    }
    terms.reduce(_ bitwiseOR _)
  }

  /** Packed cell id (res << 58 | morton) — identical to Cells.pack. */
  def cellColumn(tx: Column, ty: Column, res: Int): Column =
    lit(res.toLong << 58).bitwiseOR(mortonColumn(tx, ty, res))

  /** Explode a bbox (xmin..xmax, ymin..ymax columns) into its covering
    * grid coords at resolution `res`: adds __cx, __cy. */
  private def coverGrid(df: DataFrame, xmin: String, ymin: String, xmax: String, ymax: String,
                        res: Int): DataFrame = {
    val n = 1L << res
    df.withColumn("__cx", explode(sequence(ix(col(xmin), n), ix(col(xmax), n))))
      .withColumn("__cy", explode(sequence(iy(col(ymin), n), iy(col(ymax), n))))
  }

  /** Cover-cell count of a bbox at `res` as a pure Column — the
    * size-split routing predicate (no UDF, stays in codegen). */
  private def coverCount(b: (String, String, String, String), n: Long): Column =
    (ix(col(b._3), n) - ix(col(b._1), n) + 1) * (iy(col(b._4), n) - iy(col(b._2), n) + 1)

  /**
   * AABB intersects-join with reference-point dedup, codegen-only.
   * Each side supplies its bounds column names. Outputs all columns of
   * both inputs for every intersecting pair, exactly once.
   *
   * Size split (same argument as SpatialJoin): rows whose cover would
   * exceed `maxCells` cells at `res` never enter the grid explode — a
   * world-spanning box at res 9 would emit 262k rows — and instead take
   * a broadcast nested-loop branch on the exact overlap predicate. With
   * AQE, empty huge branches collapse, so the capped join costs the same
   * as the uncapped one when all boxes are small.
   */
  def intersectsJoin(left: DataFrame, lb: (String, String, String, String),
                     right: DataFrame, rb: (String, String, String, String),
                     res: Int, broadcastRight: Boolean = false,
                     maxCells: Int = 4096): DataFrame = {
    val n = 1L << res
    val lHuge = coverCount(lb, n) > maxCells
    val rHuge = coverCount(rb, n) > maxCells
    val overlap =
      col(lb._1) <= col(rb._3) && col(lb._3) >= col(rb._1) &&
        col(lb._2) <= col(rb._4) && col(lb._4) >= col(rb._2)

    val lc = coverGrid(left.where(!lHuge), lb._1, lb._2, lb._3, lb._4, res)
      .withColumnRenamed("__cx", "__lcx").withColumnRenamed("__cy", "__lcy")
    val rc0 = coverGrid(right.where(!rHuge), rb._1, rb._2, rb._3, rb._4, res)
      .withColumnRenamed("__cx", "__rcx").withColumnRenamed("__cy", "__rcy")
    val rc = if (broadcastRight) broadcast(rc0) else rc0
    // owner cell = grid cell of the intersection's min corner
    val ownCx = ix(greatest(col(lb._1), col(rb._1)), n)
    val ownCy = iy(greatest(col(lb._2), col(rb._2)), n)
    val grid = lc.join(rc, col("__lcx") === col("__rcx") && col("__lcy") === col("__rcy"))
      .where(overlap && col("__lcx") === ownCx && col("__lcy") === ownCy)
      .drop("__lcx", "__lcy", "__rcx", "__rcy")

    val hugeR = left.join(broadcast(right.where(rHuge)), overlap)
    val hugeLvsSmallR = broadcast(left.where(lHuge)).join(right.where(!rHuge), overlap)
    grid.union(hugeR).union(hugeLvsSmallR)
  }

  /** Tile assignment of bboxes at fixed res: one row per covering tile,
    * with the packed cell id — codegen equivalent of TileAssign.atRes. */
  def tiles(df: DataFrame, xmin: String, ymin: String, xmax: String, ymax: String,
            res: Int): DataFrame =
    coverGrid(df, xmin, ymin, xmax, ymax, res)
      .withColumn("tile", cellColumn(col("__cx"), col("__cy"), res))
      .drop("__cx", "__cy")

  /** Density of bbox covers at `res` (count + optional weight). */
  def density(df: DataFrame, xmin: String, ymin: String, xmax: String, ymax: String,
              res: Int): DataFrame =
    coverGrid(df, xmin, ymin, xmax, ymax, res)
      .groupBy(col("__cx").as("tx"), col("__cy").as("ty"))
      .agg(count(lit(1)).as("n"))
}
