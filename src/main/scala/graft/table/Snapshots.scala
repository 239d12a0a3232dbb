package graft.table

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/**
 * The snapshot-store mechanics both table kinds share (review r5 #7:
 * SpatialTable and GeomTable each carried their own copy of the
 * committed-snapshot listing and the GC fixpoint — a future fix to
 * either would have had to land in both or the table kinds silently
 * diverge). Layout contract: `<root>/_manifests/<id>.json` plus a
 * `<id>.committed` marker written LAST.
 */
private[table] object Snapshots {

  /** Snapshot ids present under the root, committed only: a marker
    * counts only with its matching manifest (secondary index layouts
    * commit markers in the same directory without one). */
  def committed(spark: SparkSession, root: String): Seq[String] = {
    val f = fs(spark, root)
    val dir = new Path(s"$root/_manifests")
    if (!f.exists(dir)) Seq.empty
    else {
      val names = f.listStatus(dir).map(_.getPath.getName).toSet
      names.filter(_.endsWith(".committed")).map(_.stripSuffix(".committed"))
        .filter(id => names.contains(s"$id.json")).toSeq.sorted
    }
  }

  /**
   * Marker-first snapshot GC with FIXPOINT reachability: every snapshot
   * NOT in `keep` and NOT (transitively) referenced by a retained
   * snapshot is deleted — each deletion removes the commit marker
   * FIRST, so a crash mid-expiry leaves an uncommitted (invisible)
   * snapshot, never a committed one missing files. `refs(id)` is the
   * by-reference edge set (physical holders this snapshot still reads);
   * `artifacts(id)` lists everything else to delete (data dirs, the
   * manifest json, sidecars). Returns the expired ids.
   */
  def expire(spark: SparkSession, root: String, keep: Seq[String],
             refs: String => Set[String],
             artifacts: String => Seq[String]): Seq[String] = {
    val all = committed(spark, root)
    val missing = keep.filterNot(all.contains)
    require(missing.isEmpty, s"cannot keep unknown snapshot(s): ${missing.mkString(", ")}")
    require(keep.nonEmpty, "keep at least one snapshot (use dropTable to delete everything)")
    // reachability to a fixpoint over the whole retained set (ADVICE
    // r4): a snapshot retained only because a kept one reads its files
    // may itself reference a third — every LISTED snapshot must keep
    // answering, so the retained set closes transitively (flattened
    // sources maps make each step one hop)
    var retain = keep.toSet
    var frontier = keep.toSet
    while (frontier.nonEmpty) {
      val next = frontier.flatMap(refs) -- retain
      retain ++= next
      frontier = next
    }
    val drop = all.filterNot(retain)
    val f = fs(spark, root)
    drop.foreach { id =>
      f.delete(new Path(s"$root/_manifests/$id.committed"), false)
      artifacts(id).foreach(p => f.delete(new Path(p), true))
    }
    drop
  }

  def writeString(f: FileSystem, path: String, s: String): Unit = {
    val out = f.create(new Path(path), true)
    out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
  }

  private def fs(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)
}
