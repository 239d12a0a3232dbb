package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/**
 * Streaming corpus curation — the batch curation operators re-expressed
 * over Structured Streaming for continuous ingest (a crawl feed arriving
 * as a stream, leaving as a clean deduplicated stream).
 *
 * Reference analog: none (the reference's streaming layer is the feature
 * changelog, §2.10) — this extends the LLM-pipeline family to the
 * streaming regime with the SAME per-row semantics as the batch
 * operators (fingerprint, quality, language id are all stateless
 * projections, so batch and stream agree row-for-row by construction).
 *
 * Scale/state design: the only stateful step is exact dedup, and its
 * state is bounded by `dropDuplicatesWithinWatermark` — fingerprints
 * older than the watermark delay age out of the state store, so state
 * size tracks the ingest window, not corpus lifetime (a plain streaming
 * dropDuplicates would grow state forever — the streaming analog of the
 * unguarded-collect class of bug). Near-dup LSH banding needs a shuffle
 * join across the whole corpus and stays a batch/compaction-time
 * operator by design; the stream gate is fingerprint-exact.
 */
object CurationStream {

  /** An arriving document. */
  final case class IncomingDoc(ts: Timestamp, docId: Long, text: String, source: String)

  /**
   * Continuous curation: watermark → quality + language id → gate →
   * fingerprint → exact dedup within the watermark window.
   *
   * The gate runs BEFORE the stateful dedup, matching the batch
   * cleanCorpus ordering (canonical election happens among gate-passers
   * only): a gate-failing first occurrence must not consume a
   * fingerprint's dedup slot and suppress a later gate-passing variant,
   * and junk rows never enter the state store.
   *
   * Emits the surviving documents with `fingerprint`, `lang_pred` and
   * `q_score` attached. `minScore` drops low-quality rows; docs with
   * duplicate fingerprints inside the watermark window are dropped after
   * their first gate-passing occurrence.
   */
  def curate(docs: Dataset[IncomingDoc],
             watermarkDelay: String = "10 minutes",
             minScore: Double = 0.2): DataFrame = {
    val scored = TextAnalysis.withLangId(TextAnalysis.withQuality(
      docs.toDF().withWatermark("ts", watermarkDelay), "text"), "text")
    val gated = scored.where(col("q_score") >= minScore)
    TextAnalysis.withFingerprint(gated, "text")
      .dropDuplicatesWithinWatermark("fingerprint")
      .select("ts", "docId", "source", "text", "fingerprint", "lang_pred", "q_score")
  }
}
