package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{coalesce, lit, not}

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
    * dedup-free multi-predicate scan (QueryPlanner.runQuery analog). */
  def unionScans(df: org.apache.spark.sql.DataFrame, branches: Seq[Column]): org.apache.spark.sql.DataFrame =
    makeDisjoint(branches).map(df.where).reduce(_ union _)
}
