package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import graft.cells.Cells
import graft.functions.{IntersectsWkb, OwnerCellWkb, StFunctions}

/**
 * Cell-partitioned spatial join — the Spark-native replacement for the
 * reference's grid-partitioned sweepline join (GeoMesaSparkSQL.scala:
 * 314-383) and its join rewrite rule (SQLRules.scala:144-209).
 *
 * Plan shape (all declarative, Catalyst/AQE handle the physics):
 *   1. each side gains `__cell` = covering cells of its geometry at a
 *      common resolution (points -> exactly one cell, no explode);
 *   2. equi-join on `__cell` — a plain shuffled/broadcast hash join, so
 *      AQE picks broadcast for small sides and handles skewed cells;
 *   3. exact JTS predicate refine;
 *   4. duplicate suppression WITHOUT a global dropDuplicates shuffle:
 *      the published "reference point" rule (also how the reference
 *      dedups multi-cell extents, QueryPlanner.scala:81-83, but pushed
 *      to the executors): a pair is emitted only by the cell that
 *      contains the top-left corner of the envelope intersection.
 *      At 10^12 rows this removes the reduce-side dedup entirely.
 *
 * Size-split for oversized geometries: a row whose envelope needs more
 * than `maxCells` cover cells at `res` must NOT enter the grid join —
 * coarsening its cover would change its cell ids' packed resolution and
 * the equi-join keys would never meet (silent pair loss), while covering
 * it at full res would explode (a world-spanning box at res 9 is 262k
 * cells). Those rows — geometrically rare by definition — are routed to
 * a broadcast nested-loop branch with the exact predicate, and the grid
 * branch's covers then never coarsen. With AQE enabled, empty huge
 * branches collapse via empty-relation propagation, so the common
 * no-huge-rows case keeps the original single-join plan cost.
 */
object SpatialJoin {

  /** cell of the envelope-intersection reference corner — the pair's
    * unique "home" cell at resolution `res`. Native codegen Expression
    * (GeomExpressions): primitive locals, no ScalaUDF boxing. */
  private def ownerCell(a: Column, b: Column, res: Column): Column =
    ExpressionUtils.column(OwnerCellWkb(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b),
      ExpressionUtils.expression(res)))

  /** Cache-backed refine predicate: the right (broadcast) side becomes a
    * PreparedGeometry — its edge index is reused across every candidate
    * pair in the partition. Native codegen Expression twin of the udf
    * surface (same kernel, no boxing). */
  def intersectsCached(l: Column, r: Column): Column =
    ExpressionUtils.column(IntersectsWkb(
      ExpressionUtils.expression(l), ExpressionUtils.expression(r)))

  /** Fused join-routing expression (native codegen, ONE WKB parse):
    * struct(huge, cells) where `cells` is the ENVELOPE-based cover (NO
    * exact-geometry refinement of the cell set — the ownership dedup's
    * uniqueness proof needs the envelope-intersection corner cell to be
    * present in BOTH sides' covers; a cover filtered to
    * exactly-intersecting cells can drop that cell for concave
    * geometries, silently losing pairs) and `huge` marks rows whose
    * envelope would overflow the cover budget at `res` (empty `cells`,
    * so the grid branch's explode drops them without a separate filter).
    * Replaces the r2-era isHuge ScalaUDF + envCover double evaluation. */
  private def coverHuge(wkb: Column, res: Int, maxCells: Int): Column =
    ExpressionUtils.column(graft.functions.CoverHugeWkb(
      ExpressionUtils.expression(wkb), ExpressionUtils.expression(lit(res)),
      ExpressionUtils.expression(lit(maxCells)),
      ExpressionUtils.expression(lit(0.0)), ExpressionUtils.expression(lit(false))))

  /**
   * General spatial join on a predicate refined after the cell equi-join.
   *
   * @param leftPoint  true when the left geometry is point-like (single
   *                   cell assignment — no explode, no dedup, no huge
   *                   branch on the left side)
   * @param res        grid resolution for the partitioning cells
   * @param maxCells   cover budget per extent; rows over budget take the
   *                   broadcast exact-predicate branch (size split)
   */
  def join(left: DataFrame, leftGeom: String,
           right: DataFrame, rightGeom: String,
           predicate: (Column, Column) => Column,
           res: Int,
           leftPoint: Boolean = false,
           maxCells: Int = 256,
           broadcastRight: Boolean = false): DataFrame = {
    val lCh = coverHuge(col(leftGeom), res, maxCells)
    val rCh = coverHuge(col(rightGeom), res, maxCells)
    val smallR = right.where(!rCh.getField("huge"))
    val hugeR = right.where(rCh.getField("huge"))

    // -- grid branch: small x small, covers never coarsen. Huge rows
    // have EMPTY fused covers, so the explode drops them — the left side
    // needs no separate hugeness filter (one expression evaluation).
    val lc =
      if (leftPoint) left.withColumn("__lcell", StFunctions.stCell(col(leftGeom), lit(res)))
      else left.withColumn("__lcell", explode(lCh.getField("cells")))
    val rc0 =
      if (leftPoint) // point probe: refined cover is sound (p in b => p's cell hits b)
        smallR.withColumn("__rcell", explode(StFunctions.stCellCover(col(rightGeom), lit(res), lit(maxCells))))
      else
        right.withColumn("__rcell", explode(rCh.getField("cells")))
    val rc = if (broadcastRight) broadcast(rc0) else rc0
    val joined = lc.join(rc, col("__lcell") === col("__rcell"))
      .where(predicate(col(leftGeom), col(rightGeom)))
    val grid =
      (if (leftPoint) joined // point lives in exactly one cell: no dupes
       else joined.where(col("__lcell") === ownerCell(col(leftGeom), col(rightGeom), lit(res))))
        .drop("__lcell", "__rcell")

    // -- huge branches: exact-predicate broadcast nested-loop over the
    // rare oversized rows; pair sets are disjoint from the grid branch
    // (classified by hugeness), each BNLJ pair emitted exactly once,
    // so the union needs no dedup.
    val allHugeRight = left.join(broadcast(hugeR), predicate(col(leftGeom), col(rightGeom)))
    val result = grid.union(allHugeRight)
    if (leftPoint) result
    else {
      val hugeLvsSmallR = broadcast(left.where(lCh.getField("huge")))
        .join(smallR, predicate(col(leftGeom), col(rightGeom)))
      result.union(hugeLvsSmallR)
    }
  }

  /** Intersects join (the flagship predicate) — cached/prepared refine. */
  def intersects(left: DataFrame, leftGeom: String, right: DataFrame, rightGeom: String,
                 res: Int, leftPoint: Boolean = false, broadcastRight: Boolean = false): DataFrame =
    join(left, leftGeom, right, rightGeom,
      (l, r) => intersectsCached(l, r), res, leftPoint, broadcastRight = broadcastRight)

  /**
   * Distance-within join (proximity search, ProximitySearchProcess
   * analog): candidates from the neighbor cells within the distance
   * radius, refined by exact haversine. The cell disk radius is derived
   * from the metric distance at the worst-case latitude of the data
   * (cells shrink east-west toward the poles, so we take the query
   * latitude band into account via the maximum |lat| given).
   */
  def dwithin(left: DataFrame, leftGeom: String, right: DataFrame, rightGeom: String,
              meters: Double, res: Int, maxAbsLat: Double = 85.0,
              broadcastRight: Boolean = false): DataFrame = {
    val degLon = meters / (111320.0 * math.max(0.05, math.cos(math.toRadians(maxAbsLat))))
    val degLat = meters / 111320.0
    val k = math.max(1, math.ceil(math.max(degLon, degLat) / Cells.lonWidth(res)).toInt)
    val lc = left.withColumn("__lcell", StFunctions.stCell(col(leftGeom), lit(res)))
    val rc0 = right
      .withColumn("__rc0", StFunctions.stCell(col(rightGeom), lit(res)))
      .withColumn("__rcell", explode(StFunctions.stCellDisk(col("__rc0"), lit(k))))
      .drop("__rc0")
    val rc = if (broadcastRight) broadcast(rc0) else rc0
    lc.join(rc, col("__lcell") === col("__rcell"))
      .where(StFunctions.stDWithin(col(leftGeom), col(rightGeom), lit(meters)))
      .drop("__lcell", "__rcell")
  }
}
