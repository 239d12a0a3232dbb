package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{coalesce, lit, not, when}

/**
 * Disjoint-OR rewrite — the reference's FilterSplitter.makeDisjoint
 * (geomesa-index-api/.../planning/FilterSplitter.scala:297-319):
 * `A OR B OR C` becomes the pairwise-disjoint sequence
 * `A, (B AND NOT A), (C AND NOT A AND NOT B)`, so running one scan per
 * branch (e.g. one z-range scan per OR'd bbox) needs no result dedup —
 * each row satisfies exactly one rewritten branch.
 */
object Disjoint {

  /** Pairwise-disjoint branches equivalent (as a union) to the input ORs.
    * Prior branches are negated null-safely (`NOT coalesce(prev, false)`):
    * under three-valued logic a row with prev = NULL and b = TRUE
    * satisfies the original OR but plain `b AND NOT prev` would be NULL
    * and the row silently dropped. */
  def makeDisjoint(branches: Seq[Column]): Seq[Column] = {
    require(branches.nonEmpty, "no branches")
    branches.zipWithIndex.map { case (b, i) =>
      branches.take(i).foldLeft(b)((acc, prev) => acc && not(coalesce(prev, lit(false))))
    }
  }

  /** Union-of-scans helper: run `scan` per disjoint branch and union —
    * dedup-free multi-predicate scan (QueryPlanner.runQuery analog).
    *
    * Use this form ONLY when the branches map to DISTINCT storage ranges
    * (separate z-range scans, different partitions): that is what the
    * reference's makeDisjoint exists for. Over a single table whose
    * branch predicates do not prune storage, k branches = k full scans —
    * use [[taggedScan]] there (one scan, same disjoint semantics). */
  def unionScans(df: DataFrame, branches: Seq[Column]): DataFrame =
    makeDisjoint(branches).map(df.where).reduce(_ union _)

  /** Single-scan disjoint-OR: ONE pass with `where(A OR B OR ...)` plus a
    * branch tag (the index of the first — and under the disjoint rewrite,
    * only — branch the row satisfies, null-safely). Row multiset equals
    * unionScans' exactly, at 1/k of the I/O when branches cannot prune
    * storage ranges. The OR'd predicate still pushes to the scan. */
  def taggedScan(df: DataFrame, branches: Seq[Column],
                 tagCol: String = "branch"): DataFrame = {
    require(branches.nonEmpty, "no branches")
    val anyBranch = branches.map(b => coalesce(b, lit(false))).reduce(_ || _)
    val tag = branches.zipWithIndex.foldRight(lit(-1): Column) { case ((b, i), rest) =>
      when(coalesce(b, lit(false)), lit(i)).otherwise(rest)
    }
    df.where(anyBranch).withColumn(tagCol, tag)
  }
}
