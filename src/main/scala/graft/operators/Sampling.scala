package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic stratified sampling — the "domain mixing" step of a
 * training-data pipeline: per stratum (language, source, ...) keep an
 * exact quota of rows, chosen by a seeded hash of the key so the sample
 * is reproducible run-to-run and engine-to-engine (no RNG, no
 * partition-order dependence).
 *
 * Reference analog: the reference's SamplingIterator/FeatureSampler
 * (geomesa-index-api/.../iterators/SamplingIterator.scala:22-70) thins
 * streams per key by every-nth; this is the quota-exact batch variant a
 * corpus pipeline needs (the every-nth form is `q_sample`'s built-in
 * `row_number % n` mapping, SURVEY §2.8).
 */
object Sampling {

  /** Seeded multiplicative hash of a BIGINT key — SQL-replicable (the
    * same text is the DuckDB oracle) and collision-tied rows fall back
    * to the key itself for a total order. */
  def orderHashSql(keyCol: String, seed: Long): String =
    s"(($keyCol * 104729 + $seed) % 999999937)"

  /**
   * Keep at most `quotas(stratum)` (else `defaultQuota`) rows per value
   * of `strataCol`, ordered by the seeded hash of `keyCol` (ties broken
   * by the key). Exact and skew-safe at any stratum size: a first
   * row_number pass runs per (stratum, salt) — `salts`-way parallel even
   * if one stratum holds 99% of the corpus — and only the ≤ salts×quota
   * local winners enter the single-task-per-stratum final window. The
   * global top-N by a total order is always a subset of the union of
   * per-salt top-Ns, so the two-phase result equals the one-window
   * result row-for-row.
   *
   * Output = input columns + `sample_rank` (1-based rank within the
   * stratum in hash order).
   */
  def stratifiedTopK(df: DataFrame, strataCol: String, keyCol: String,
                     quotas: Map[String, Int], defaultQuota: Int,
                     seed: Long = 7919L, salts: Int = 16): DataFrame = {
    require(defaultQuota >= 0 && quotas.values.forall(_ >= 0), "quotas must be >= 0")
    val quota: Column =
      if (quotas.isEmpty) lit(defaultQuota)
      else {
        val m = map(quotas.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
        coalesce(element_at(m, col(strataCol)), lit(defaultQuota))
      }
    val h = expr(orderHashSql(keyCol, seed))
    val local = Window.partitionBy(col(strataCol), pmod(col(keyCol), lit(salts)))
      .orderBy(h.asc, col(keyCol).asc)
    val global = Window.partitionBy(col(strataCol)).orderBy(h.asc, col(keyCol).asc)
    df.withColumn("__q", quota)
      .withColumn("__rn", row_number.over(local)).where(col("__rn") <= col("__q"))
      .withColumn("sample_rank", row_number.over(global))
      .where(col("sample_rank") <= col("__q"))
      .drop("__rn", "__q")
  }
}
