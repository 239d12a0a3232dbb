package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.cells.Cells
import graft.functions.StFunctions

/**
 * Distributed k-nearest-neighbor join: for each query point, the k
 * closest data points by great-circle distance.
 *
 * Semantics mirror the reference's cell-ring expansion search
 * (/root/reference/geomesa-process/.../knn/GeoHashSpiral.scala:96-151,
 * KNNQuery.scala:57-81): seed at the query's cell, expand rings of
 * neighbor cells, shrink the radius to the current kth distance,
 * terminate when no unvisited cell can be closer. Re-expressed for BSP
 * execution: instead of a per-query priority-queue loop, a bounded
 * number of whole-fleet rounds —
 *
 *   growth:  double the cell-disk radius until every query has >= k
 *            candidates (log #rounds, each one Spark job over
 *            candidates only, never the full cross product);
 *   proof:   from the candidates, take each query's kth-smallest
 *            distance d_k; any point outside disk radius
 *            r'(q) = ceil(d_k / metricCellWidth(lat_q)) + 1 is provably
 *            farther than d_k (the k-completeness argument the
 *            reference's GEOMESA-285 note asks for, done per query
 *            with the latitude-dependent east-west cell width);
 *   final:   one exact pass over the per-query proven disk, then a
 *            top-k window.
 *
 * Queries are broadcast (the reference collects them too); data points
 * are never collected, so the operator scales with executors.
 */
object KnnJoin {

  private val MetersPerDegLat = 110574.0
  private val MetersPerDegLon = 111320.0

  def apply(spark: SparkSession,
            points: DataFrame, lonCol: String, latCol: String,
            queries: DataFrame, qidCol: String, qLonCol: String, qLatCol: String,
            k: Int, res: Int, maxRings: Int = 64): DataFrame = {

    val distExpr = StFunctions.stDistanceSphere(
      StFunctions.stMakePoint(col(lonCol), col(latCol)),
      StFunctions.stMakePoint(col(qLonCol), col(qLatCol)))

    val pts = points.withColumn("__pcell", StFunctions.stCellOfXY(col(lonCol), col(latCol), lit(res)))
    val qs = queries.withColumn("__qcell", StFunctions.stCellOfXY(col(qLonCol), col(qLatCol), lit(res)))
    qs.cache()
    val nq = qs.count()

    def candidates(ringOf: DataFrame): DataFrame =
      pts.join(
        broadcast(ringOf.withColumn("__cell", explode(StFunctions.stCellDisk(col("__qcell"), col("__ring"))))),
        col("__pcell") === col("__cell"))

    // -- growth phase ---------------------------------------------------
    var ring = 1
    var done = false
    while (!done && ring < maxRings) {
      val cand = candidates(qs.withColumn("__ring", lit(ring)))
      val enough = cand.groupBy(qidCol).count().where(col("count") >= k).count()
      done = enough == nq
      if (!done) ring = math.min(maxRings, ring * 2)
    }

    // -- proof phase: per-query kth distance -> proven disk radius ------
    val grown = candidates(qs.withColumn("__ring", lit(ring)))
      .withColumn("__dist", distExpr)
    val kth = grown
      .withColumn("__rn", row_number().over(Window.partitionBy(qidCol).orderBy(col("__dist"))))
      .where(col("__rn") === k || col("__rn") < k) // queries with < k points keep their max
      .groupBy(qidCol).agg(max("__dist").as("__dk"), first(col(qLatCol)).as("__qlat"))

    val latW = Cells.latWidth(res)
    val lonW = Cells.lonWidth(res)
    val provenRing = udf { (dk: Double, qlat: Double) =>
      // metric width of one cell step: north-south is latitude-constant;
      // east-west shrinks with cos(lat) — take the tighter requirement
      // over the band the disk can reach
      val bandLat = math.min(89.0, math.abs(qlat) + latW * (maxRings + 1))
      val stepNS = latW * MetersPerDegLat
      val stepEW = lonW * MetersPerDegLon * math.cos(math.toRadians(bandLat))
      val need = math.max(
        math.ceil(dk / stepNS),
        math.ceil(dk / math.max(1.0, stepEW))).toInt + 1
      math.min(maxRings, math.max(1, need))
    }
    val qsProven = qs.join(broadcast(kth), qidCol)
      .withColumn("__ring", provenRing(col("__dk"), col("__qlat")))
      .drop("__dk", "__qlat")

    // -- final exact pass ----------------------------------------------
    candidates(qsProven)
      .withColumn("dist", distExpr)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(qidCol).orderBy(col("dist"), col(lonCol), col(latCol))))
      .where(col("__rn") <= k)
      .drop("__rn", "__pcell", "__qcell", "__cell", "__ring")
  }

  /** Brute-force oracle (for tests): exact cross-join top-k. */
  def bruteForce(points: DataFrame, lonCol: String, latCol: String,
                 queries: DataFrame, qidCol: String, qLonCol: String, qLatCol: String,
                 k: Int): DataFrame = {
    val distExpr = StFunctions.stDistanceSphere(
      StFunctions.stMakePoint(col(lonCol), col(latCol)),
      StFunctions.stMakePoint(col(qLonCol), col(qLatCol)))
    points.crossJoin(broadcast(queries))
      .withColumn("dist", distExpr)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(qidCol).orderBy(col("dist"), col(lonCol), col(latCol))))
      .where(col("__rn") <= k)
      .drop("__rn")
  }
}
