package graft.table

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, TimestampType}

import graft.cells.Cells

/**
 * Cached table statistics — the reference's GeoMesaStats surface
 * (geomesa-index-api/.../stats/GeoMesaStats.scala; behavior fixtures in
 * AccumuloDataStoreStatsTest:49-390): stats are COLLECTED at write time
 * and served from metadata afterwards, so `getCount` / `getBounds` /
 * `getAttributeBounds` never scan the data, and query planning can
 * estimate selectivity cheaply. `exact = true` falls back to a real
 * scan, like the reference's `StatsScan` path.
 *
 * Spark-first shape: collection is ONE distributed aggregation job over
 * the snapshot (count + envelope + per-attribute min/max/non-null/
 * approx-cardinality in a single `agg`, all codegen; TopK adds one
 * small groupBy per tracked attribute), serialized as a JSON sidecar
 * `<root>/_stats/<snapshot>.json` — the analog of the reference's
 * catalog-metadata stat rows (monoidal merge happens inside Spark's
 * partial aggregation instead of an Accumulo StatsCombiner). Spatial
 * count ESTIMATES come from the per-partition lineage metrics the write
 * already records (rows per cell_prefix): the estimate is the row count
 * of the directories a bbox cover touches — a guaranteed superset at
 * prefix granularity, zero I/O beyond the tiny metrics table. That
 * replaces the reference's stored spatial histogram sketch with
 * metadata the layout maintains anyway.
 */
object TableStats {

  /** Whole-world bounds, returned when no stats exist or the table is
    * empty (the reference's wholeWorldEnvelope default). */
  val WholeWorld: (Double, Double, Double, Double) = (-180.0, -90.0, 180.0, 90.0)

  /** `hll` is the base64 DataSketches HLL sketch over the attribute's
    * RENDERED values (the same string domain min/max use — sketching
    * the rendering keeps every attribute type supported and the
    * collect/merge domains identical). Present since round 4; absent on
    * older sidecars, where the mutation delta falls back to the
    * max(old, added) cardinality lower bound. */
  final case class AttributeStat(min: String, max: String, count: Long,
                                 cardinality: Long, dataType: String,
                                 topK: Seq[(String, Long)],
                                 hll: Option[String] = None)

  /** `deleted` accumulates the rows removed across the mutation chain
    * since the last full [[collect]]; `stale` flags when that total has
    * crossed the staleness fraction of the live count — expand-only
    * bounds and union-only HLLs are then upper bounds a planner should
    * distrust (VERDICT r4 #6). A re-collect resets both. */
  final case class Stats(snapshot: String, count: Long,
                         bounds: Option[(Double, Double, Double, Double)],
                         attributes: Map[String, AttributeStat],
                         deleted: Long = 0L, stale: Boolean = false)

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def statsPath(root: String, snapshotId: String) =
    s"$root/_stats/$snapshotId.json"

  def exists(spark: SparkSession, root: String, snapshotId: String): Boolean =
    fs(spark, root).exists(new Path(statsPath(root, snapshotId)))

  /** Render a stat value losslessly enough to order/compare after a
    * round-trip: timestamps as UTC micros, everything else as its
    * canonical string form. */
  private def render(dt: DataType, c: org.apache.spark.sql.Column) = dt match {
    case TimestampType => unix_micros(c).cast("string")
    case _ => c.cast("string")
  }

  /**
   * Collect and persist stats for a snapshot in one aggregation pass
   * (+ one small groupBy per tracked attribute for TopK). `attributes`
   * names the columns to track bounds/TopK for — the reference tracks
   * the default geometry, default date, and indexed attributes
   * (GeoMesaMetadataStats.statsFor). Re-collect overwrites.
   */
  def collect(spark: SparkSession, root: String, snapshotId: String,
              attributes: Seq[String] = Seq.empty,
              lonCol: String = "lon", latCol: String = "lat",
              topK: Int = 10): Unit =
    collectDf(spark, SpatialTable.read(spark, root, snapshotId), root, snapshotId,
      attributes, (lonCol, latCol, lonCol, latCol), topK)

  /** Extent-table stats (the reference's stats are datastore-wide, not
    * point-only): same sidecar format and query surface, with the
    * envelope aggregated from the stored minx/miny/maxx/maxy extent
    * columns the XZ layouts maintain. */
  def collectGeom(spark: SparkSession, root: String, snapshotId: String,
                  attributes: Seq[String] = Seq.empty, topK: Int = 10): Unit =
    collectDf(spark, GeomTable.read(spark, root, snapshotId), root, snapshotId,
      attributes, ("minx", "miny", "maxx", "maxy"), topK)

  /** `bcols` = (minXCol, minYCol, maxXCol, maxYCol): point tables pass
    * (lon, lat, lon, lat) — min/max of the same column pair — extent
    * tables their four stored envelope columns. */
  private def collectDf(spark: SparkSession, df0: DataFrame, root: String,
                        snapshotId: String, attributes: Seq[String],
                        bcols: (String, String, String, String), topK: Int): Unit = {
    // one disk read total: the main agg plus each tracked attribute's
    // TopK groupBy all scan the persisted copy, not the parquet N+1 times
    // (writeConfigured/rewrite call this on every write and mutation)
    val df = df0.persist()
    val tracked = attributes.filter(df.columns.contains)
    val spatial = Seq(bcols._1, bcols._2, bcols._3, bcols._4)
      .forall(df.columns.contains)
    val aggs =
      Seq(count(lit(1)).as("count")) ++
        // envelope as double regardless of the column's numeric type
        // (decimal lon/lat tables would ClassCastException on getDouble)
        (if (spatial) Seq(min(col(bcols._1).cast("double")).as("minx"),
          min(col(bcols._2).cast("double")).as("miny"),
          max(col(bcols._3).cast("double")).as("maxx"),
          max(col(bcols._4).cast("double")).as("maxy")) else Nil) ++
        tracked.flatMap { a =>
          val dt = df.schema(a).dataType
          Seq(render(dt, min(col(a))).as(s"min_$a"), render(dt, max(col(a))).as(s"max_$a"),
            count(col(a)).as(s"count_$a"), approx_count_distinct(col(a)).as(s"card_$a"),
            // mergeable cardinality: a DataSketches HLL over the rendered
            // values rides along so mutation deltas can UNION instead of
            // falling back to a lower bound (the reference's
            // MetadataBackedStats stores exactly this sketch)
            hll_sketch_agg(render(dt, col(a))).as(s"hll_$a"))
        }
    val (row, tops) = try {
      val r = df.agg(aggs.head, aggs.tail: _*).collect().head
      val total = r.getLong(r.fieldIndex("count"))
      val t: Map[String, Seq[(String, Long)]] =
        if (total == 0) Map.empty
        else tracked.map { a =>
          val dt = df.schema(a).dataType
          a -> df.where(col(a).isNotNull)
            .groupBy(render(dt, col(a)).as("v")).agg(count(lit(1)).as("n"))
            .orderBy(desc("n"), asc("v")).limit(topK).collect()
            .map(r => (r.getString(0), r.getLong(1))).toSeq
        }.toMap
      (r, t)
    } finally df.unpersist()
    val total = row.getLong(row.fieldIndex("count"))

    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    node.put("snapshot", snapshotId)
    node.put("count", total)
    if (spatial && total > 0) {
      val b = node.putArray("bounds")
      Seq("minx", "miny", "maxx", "maxy").foreach(f =>
        b.add(row.getDouble(row.fieldIndex(f))))
    }
    val attrsNode = node.putObject("attributes")
    tracked.foreach { a =>
      val n = attrsNode.putObject(a)
      val cnt = row.getLong(row.fieldIndex(s"count_$a"))
      n.put("count", cnt)
      n.put("cardinality", row.getLong(row.fieldIndex(s"card_$a")))
      n.put("type", df.schema(a).dataType.simpleString)
      if (cnt > 0) {
        n.put("min", row.getString(row.fieldIndex(s"min_$a")))
        n.put("max", row.getString(row.fieldIndex(s"max_$a")))
      }
      Option(row.getAs[Array[Byte]](row.fieldIndex(s"hll_$a"))).foreach(b =>
        n.put("hll", java.util.Base64.getEncoder.encodeToString(b)))
      val tk = n.putArray("topk")
      tops.getOrElse(a, Nil).foreach { case (v, c) =>
        val e = tk.addArray(); e.add(v); e.add(c)
      }
    }
    val f = fs(spark, root)
    f.mkdirs(new Path(s"$root/_stats"))
    val out = f.create(new Path(statsPath(root, snapshotId)), true)
    try out.write(mapper.writeValueAsString(node).getBytes("UTF-8")) finally out.close()
  }

  /** Render-domain compare: timestamps render as micros and numerics as
    * their canonical form, so anything non-string compares numerically;
    * strings (and dates, which render ISO-sortable) lexicographically. */
  private def lessRendered(dataType: String, a: String, b: String): Boolean = {
    val numeric = Set("tinyint", "smallint", "int", "bigint", "float", "double", "timestamp")
    if (numeric.contains(dataType) || dataType.startsWith("decimal"))
      BigDecimal(a) < BigDecimal(b)
    else a < b
  }

  /**
   * Writer-maintained incremental stats for a scoped mutation — the
   * reference's MetadataBackedStats path (the Accumulo writer merges a
   * per-write delta into the stored stat rows instead of rescanning):
   * counts move EXACTLY (old - removed + added, per attribute too);
   * bounds and per-attribute min/max EXPAND only (a delete never shrinks
   * them — exactly the reference's semantics, where an exact refresh
   * requires a stats re-collect / StatsScan); topK merges the added
   * rows' value counts into the stored sketch (approximate, as the
   * reference's TopK combine is); cardinality keeps the larger of the
   * stored estimate and the added rows' own (a lower bound — HLL
   * sketches are not stored, so union is not available; re-collect for
   * exact). One tiny aggregate over each of `removed`/`added` — never a
   * table scan. No-op when the source snapshot has no stats.
   */
  def applyMutationDelta(spark: SparkSession, root: String, fromSnapshot: String,
                         toSnapshot: String, removed: DataFrame, added: DataFrame,
                         lonCol: String = "lon", latCol: String = "lat",
                         topK: Int = 10, staleFraction: Double = 0.5,
                         boundsCols: Option[(String, String, String, String)] = None): Unit = {
    val st = cached(spark, root, fromSnapshot).getOrElse(return)
    val tracked = st.attributes.keys.toSeq.sorted
    // envelope columns: point tables min/max the same lon/lat pair,
    // extent tables pass their four stored envelope columns
    val bcols = boundsCols.getOrElse((lonCol, latCol, lonCol, latCol))

    def deltaOf(df: DataFrame): (Long, Option[(Double, Double, Double, Double)],
        Map[String, (Option[String], Option[String], Long, Long, Option[Array[Byte]])]) = {
      val spatial = Seq(bcols._1, bcols._2, bcols._3, bcols._4)
        .forall(df.columns.contains)
      val present = tracked.filter(df.columns.contains)
      val aggs = Seq(count(lit(1)).as("n")) ++
        (if (spatial) Seq(min(col(bcols._1).cast("double")).as("minx"),
          min(col(bcols._2).cast("double")).as("miny"),
          max(col(bcols._3).cast("double")).as("maxx"),
          max(col(bcols._4).cast("double")).as("maxy")) else Nil) ++
        present.flatMap { a =>
          val dt = df.schema(a).dataType
          Seq(render(dt, min(col(a))).as(s"min_$a"), render(dt, max(col(a))).as(s"max_$a"),
            count(col(a)).as(s"n_$a"), approx_count_distinct(col(a)).as(s"card_$a"),
            hll_sketch_agg(render(dt, col(a))).as(s"hll_$a"))
        }
      val r = df.agg(aggs.head, aggs.tail: _*).collect().head
      val n = r.getLong(r.fieldIndex("n"))
      val env = if (spatial && n > 0)
        Some((r.getDouble(r.fieldIndex("minx")), r.getDouble(r.fieldIndex("miny")),
          r.getDouble(r.fieldIndex("maxx")), r.getDouble(r.fieldIndex("maxy"))))
      else None
      val attrs = present.map { a =>
        val cnt = r.getLong(r.fieldIndex(s"n_$a"))
        a -> (Option(r.getString(r.fieldIndex(s"min_$a"))).filter(_ => cnt > 0),
          Option(r.getString(r.fieldIndex(s"max_$a"))).filter(_ => cnt > 0),
          cnt, r.getLong(r.fieldIndex(s"card_$a")),
          Option(r.getAs[Array[Byte]](r.fieldIndex(s"hll_$a"))).filter(_ => cnt > 0))
      }.toMap
      (n, env, attrs)
    }
    val (remN, _, remAttrs) = deltaOf(removed)
    val (addN, addEnv, addAttrs) = deltaOf(added)

    /** Union the stored sketch with the added rows' — the reference's
      * MetadataBackedStats HLL merge; deletes cannot subtract (neither
      * can the reference's). Pure DRIVER-SIDE DataSketches calls on the
      * two serialized sketches (ADVICE r4: the previous spark.range(1)
      * form launched a cluster job per tracked attribute per mutation —
      * including the no-added-rows case). Returns (estimate, merged
      * base64). */
    def mergeHll(oldB64: String, addSketch: Option[Array[Byte]]): (Long, String) = {
      import org.apache.datasketches.hll.{HllSketch, TgtHllType, Union}
      val ob = java.util.Base64.getDecoder.decode(oldB64)
      addSketch match {
        case None =>
          // no added rows: the sketch (and its estimate) are unchanged
          (Math.round(HllSketch.heapify(ob).getEstimate), oldB64)
        case Some(ab) =>
          // lgMaxK 12 = hll_sketch_agg's default lgConfigK; HLL_8 is
          // Spark's own hll_union result type, so the merged bytes stay
          // interchangeable with the SQL-side sketch functions
          val u = new Union(12)
          u.update(HllSketch.heapify(ob))
          u.update(HllSketch.heapify(ab))
          val merged = u.getResult(TgtHllType.HLL_8)
          (Math.round(merged.getEstimate),
            java.util.Base64.getEncoder.encodeToString(merged.toUpdatableByteArray))
      }
    }

    // added rows' value counts for the topK merge: the added side's own
    // top candidates plus refreshed counts for every stored topK value
    def addedCounts(a: String): Map[String, Long] =
      if (!added.columns.contains(a)) Map.empty
      else {
        val dt = added.schema(a).dataType
        val grouped = added.where(col(a).isNotNull)
          .groupBy(render(dt, col(a)).as("v")).agg(count(lit(1)).as("n"))
        val top = grouped.orderBy(desc("n"), asc("v")).limit(topK).collect()
        val stored = st.attributes(a).topK.map(_._1)
        val refreshed = if (stored.isEmpty) Array.empty[org.apache.spark.sql.Row]
          else grouped.where(col("v").isin(stored: _*)).collect()
        (top ++ refreshed).map(r => r.getString(0) -> r.getLong(1)).toMap
      }

    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    node.put("snapshot", toSnapshot)
    val total = math.max(0L, st.count - remN + addN)
    node.put("count", total)
    // staleness guard (VERDICT r4 #6): counts move exactly, but bounds
    // only expand and HLLs only union — a delete-heavy chain makes them
    // increasingly loose upper bounds. Track the cumulative deletions
    // since the last full collect; once they cross `staleFraction` of
    // the live count, flag the sidecar so planners (and operators
    // seeding from cached stats) know a re-collect is due.
    val deleted = st.deleted + remN
    node.put("deleted", deleted)
    val isStale = deleted >= staleFraction * math.max(1L, total)
    node.put("stale", isStale)
    val bounds = (st.bounds, addEnv) match {
      case (Some(b), Some(e)) => Some((math.min(b._1, e._1), math.min(b._2, e._2),
        math.max(b._3, e._3), math.max(b._4, e._4)))
      case (b, e) => b.orElse(e)
    }
    if (total > 0) bounds.foreach { b =>
      val arr = node.putArray("bounds")
      arr.add(b._1); arr.add(b._2); arr.add(b._3); arr.add(b._4)
    }
    val attrsNode = node.putObject("attributes")
    tracked.foreach { a =>
      val old = st.attributes(a)
      val (addMin, addMax, addCnt, addCard, addHll) =
        addAttrs.getOrElse(a, (None, None, 0L, 0L, None))
      val remCnt = remAttrs.get(a).map(_._3).getOrElse(0L)
      val n = attrsNode.putObject(a)
      val cnt = math.max(0L, old.count - remCnt + addCnt)
      n.put("count", cnt)
      // sketch union when the sidecar carries one (collect() has since
      // round 4); pre-sketch sidecars fall back to the documented
      // max(old, added) lower bound
      old.hll match {
        case Some(oldB64) =>
          val (est, merged) = mergeHll(oldB64, addHll)
          n.put("cardinality", est)
          n.put("hll", merged)
        case None =>
          n.put("cardinality", math.max(old.cardinality, addCard))
      }
      n.put("type", old.dataType)
      val oldMin = Option(old.min).filter(_ => old.count > 0)
      val oldMax = Option(old.max).filter(_ => old.count > 0)
      val mn = (oldMin, addMin) match {
        case (Some(x), Some(y)) => Some(if (lessRendered(old.dataType, y, x)) y else x)
        case (x, y) => x.orElse(y)
      }
      val mx = (oldMax, addMax) match {
        case (Some(x), Some(y)) => Some(if (lessRendered(old.dataType, x, y)) y else x)
        case (x, y) => x.orElse(y)
      }
      if (cnt > 0) { mn.foreach(n.put("min", _)); mx.foreach(n.put("max", _)) }
      val ac = addedCounts(a)
      val oldTk = old.topK.toMap
      val merged = (oldTk.keySet ++ ac.keySet).toSeq
        .map(v => v -> (oldTk.getOrElse(v, 0L) + ac.getOrElse(v, 0L)))
      val tk = n.putArray("topk")
      merged.sortBy { case (v, c) => (-c, v) }.take(topK).foreach { case (v, c) =>
        val e = tk.addArray(); e.add(v); e.add(c)
      }
    }
    val f = fs(spark, root)
    f.mkdirs(new Path(s"$root/_stats"))
    val out = f.create(new Path(statsPath(root, toSnapshot)), true)
    try out.write(mapper.writeValueAsString(node).getBytes("UTF-8")) finally out.close()
  }

  /** Parse the cached stats; None when never collected. */
  def cached(spark: SparkSession, root: String, snapshotId: String): Option[Stats] = {
    val f = fs(spark, root)
    val p = new Path(statsPath(root, snapshotId))
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val text = try new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8") finally in.close()
      val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(text)
      val bounds = Option(n.get("bounds")).filter(_.size == 4).map(b =>
        (b.get(0).asDouble, b.get(1).asDouble, b.get(2).asDouble, b.get(3).asDouble))
      val attrs = {
        val it = n.get("attributes").fields()
        val b = Map.newBuilder[String, AttributeStat]
        while (it.hasNext) {
          val e = it.next()
          val a = e.getValue
          val tk = (0 until a.get("topk").size).map { i =>
            val pair = a.get("topk").get(i)
            (pair.get(0).asText, pair.get(1).asLong)
          }
          b += e.getKey -> AttributeStat(
            Option(a.get("min")).map(_.asText).orNull,
            Option(a.get("max")).map(_.asText).orNull,
            a.get("count").asLong, a.get("cardinality").asLong,
            a.get("type").asText, tk,
            Option(a.get("hll")).map(_.asText))
        }
        b.result()
      }
      Some(Stats(n.get("snapshot").asText, n.get("count").asLong, bounds, attrs,
        deleted = Option(n.get("deleted")).map(_.asLong).getOrElse(0L),
        stale = Option(n.get("stale")).exists(_.asBoolean)))
    }
  }

  /** Whether the snapshot's manifest is an extent (GeomTable) one —
    * point manifests always carry a top-level prefix_res (review r5c
    * #2: the exact/estimate fallbacks must route by table kind now
    * that extent roots are stats citizens). */
  private def isExtent(spark: SparkSession, root: String, snapshotId: String): Boolean = {
    val f = fs(spark, root)
    val p = new Path(s"$root/_manifests/$snapshotId.json")
    require(f.exists(p), s"no manifest for snapshot $snapshotId under $root")
    val in = f.open(p)
    val txt = try new String(
      org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8") finally in.close()
    !new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt).has("prefix_res")
  }

  /** Feature count: cached (None when stats were never collected) or
    * exact via a scan, optionally under a CQL filter — the reference's
    * stats.getCount(sft, filter, exact). Exact scans route by the
    * manifest's table kind (point or extent). */
  def getCount(spark: SparkSession, root: String, snapshotId: String,
               exact: Boolean = false, cql: Option[String] = None,
               lonCol: String = "lon", latCol: String = "lat",
               idColumn: String = "id"): Option[Long] = {
    if (exact) {
      val df =
        if (isExtent(spark, root, snapshotId)) cql match {
          case Some(q) => GeomTable.queryCql(spark, root, snapshotId, q,
            GeomTable.manifest(spark, root, snapshotId).geom, idColumn)
          case None => GeomTable.read(spark, root, snapshotId)
        } else cql match {
          case Some(q) => SpatialTable.queryCql(spark, root, snapshotId, q, lonCol, latCol, idColumn)
          case None => SpatialTable.read(spark, root, snapshotId)
        }
      Some(df.count())
    } else cached(spark, root, snapshotId).map(_.count)
  }

  /** Spatial bounds from the cached stats; whole world when stats are
    * missing or the table is empty (the reference's default). */
  def getBounds(spark: SparkSession, root: String,
                snapshotId: String): (Double, Double, Double, Double) =
    cached(spark, root, snapshotId).flatMap(_.bounds).getOrElse(WholeWorld)

  /** (min, max, non-null count) for a tracked attribute, rendered as
    * strings (timestamps as UTC micros); None when untracked or empty. */
  def getAttributeBounds(spark: SparkSession, root: String, snapshotId: String,
                         attribute: String): Option[(String, String, Long)] =
    cached(spark, root, snapshotId).flatMap(_.attributes.get(attribute))
      .filter(_.count > 0).map(a => (a.min, a.max, a.count))

  def getTopK(spark: SparkSession, root: String, snapshotId: String,
              attribute: String): Seq[(String, Long)] =
    cached(spark, root, snapshotId).flatMap(_.attributes.get(attribute))
      .map(_.topK).getOrElse(Seq.empty)

  /**
   * Estimated count for a bbox query, from the per-partition lineage
   * metrics: the total rows of the cell_prefix directories the bbox
   * cover touches. A superset bound at prefix granularity (estimate >=
   * exact; 0 exactly when no data directory intersects the box), zero
   * data I/O — the planner-side analog of the reference's stored
   * spatial histogram estimate (GeoMesaStats.getCount without exact).
   */
  def estimateCount(spark: SparkSession, root: String, snapshotId: String,
                    bbox: (Double, Double, Double, Double),
                    maxCells: Int = 4096): Long = {
    if (isExtent(spark, root, snapshotId)) {
      // extent roots carry per-chunk row counts in the MANIFEST (no
      // _metrics table): the estimate is the total rows of the chunks
      // the bbox's coarse XZ ranges cover — a guaranteed superset at
      // chunk granularity, zero data I/O, exactly like the point path
      val info = GeomTable.ginfo(spark, root, snapshotId)
      require(info.chunked,
        s"legacy extent snapshot $snapshotId has no partition stats — re-commit via rewrite")
      val ranges = graft.cells.XZ2(info.m.chunkRes)
        .ranges(bbox._1, bbox._2, bbox._3, bbox._4, 64)
      return info.partitions.collect {
        case (k, rows) if ranges.exists(r => k.chunk >= r.lower && k.chunk <= r.upper) => rows
      }.sum
    }
    val snap = SpatialTable.manifest(spark, root, snapshotId)
    val m = spark.read.parquet(s"$root/_metrics/snapshot=$snapshotId")
    val pruned =
      if (Cells.coverCountBBox(bbox._1, bbox._2, bbox._3, bbox._4, snap.prefixRes) > maxCells) m
      else m.where(col("cell_prefix").isin(
        Cells.coverBBox(bbox._1, bbox._2, bbox._3, bbox._4, snap.prefixRes, maxCells): _*))
    pruned.agg(coalesce(sum("rows"), lit(0L))).collect().head.getLong(0)
  }
}
