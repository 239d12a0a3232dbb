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
    * to the key itself for a total order. The key is reduced mod the
    * prime BEFORE multiplying so a full-range 64-bit key (a fingerprint
    * used as an id) cannot overflow BIGINT under ANSI mode — the
    * remainder (sign-of-dividend) semantics match in Spark and DuckDB,
    * so negative keys hash identically on both engines too. */
  def orderHashSql(keyCol: String, seed: Long): String =
    s"((($keyCol % 999999937) * 104729 + $seed) % 999999937)"

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

  /**
   * Token-budget sequence packing — the sharding step that turns a
   * curated corpus into fixed-size training shards: documents are laid
   * out on one deterministic token stream (ordered by the seeded hash of
   * `idCol`, ties by the id) and each document is assigned the shard its
   * first token lands in (`shard_id = start_offset div budget`, plus
   * `shard_offset = start_offset mod budget`). Documents may straddle a
   * boundary — this is concatenate-then-split packing, the layout a
   * pretraining data writer materializes.
   *
   * 100-TB shape: the global prefix sum is two-phase. The hash order is
   * cut into `buckets` contiguous hash ranges (uniform by construction),
   * each bucket cumulates locally under one window; cross-bucket offsets
   * are a second window over the `buckets`-row totals (trivially small —
   * the single-task window touches `buckets` rows, never data), joined
   * back by broadcast. No global single-task window ever sees the
   * corpus.
   *
   * Output: input columns + `start_offset`, `shard_id`, `shard_offset`.
   */
  def packShards(df: DataFrame, idCol: String, tokenCol: String, budget: Long,
                 seed: Long = 7919L, buckets: Int = 64): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(buckets > 0, "buckets must be positive")
    val mod = 999999937L
    val bucketWidth = (mod + buckets - 1) / buckets
    val h = expr(orderHashSql(idCol, seed))
    val withKeys = df
      .withColumn("__tok", coalesce(col(tokenCol).cast("long"), lit(0L)))
      .withColumn("__ord", h)
      .withColumn("__bkt", expr(s"__ord div $bucketWidth"))
    val local = Window.partitionBy(col("__bkt"))
      .orderBy(col("__ord").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = withKeys.withColumn("__cum", sum(col("__tok")).over(local))
    // bucket totals come FROM the windowed branch (max running sum =
    // bucket total), so the totals groupBy reuses the window's
    // hashpartitioning(__bkt) exchange instead of re-scanning the input
    val offsets = cum.groupBy(col("__bkt"))
      .agg(max(col("__cum")).as("__bt"))
      .withColumn("__off", coalesce(
        sum(col("__bt")).over(
          Window.orderBy(col("__bkt").asc)
            .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("__bkt"), col("__off"))
    cum.join(broadcast(offsets), "__bkt")
      .withColumn("start_offset", col("__off") + col("__cum") - col("__tok"))
      .withColumn("shard_id", expr(s"start_offset div ${budget}L"))
      .withColumn("shard_offset", pmod(col("start_offset"), lit(budget)))
      .drop("__tok", "__ord", "__bkt", "__cum", "__off")
  }
}
