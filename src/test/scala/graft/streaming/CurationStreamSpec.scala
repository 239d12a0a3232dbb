package graft.streaming

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkTest
import CurationStream._

/** Streaming curation: exact dedup within the watermark window, quality
  * gate, and batch/stream row-level parity of the stateless signals. */
class CurationStreamSpec extends AnyFunSuite with SparkTest {

  private def ts(minute: Int): Timestamp = new Timestamp(1700000000000L + minute * 60000L)

  private val goodText =
    "the quick brown fox jumps over the lazy dog and keeps running through the field " +
      "with a steady pace that is easy to read and clearly not junk at all"

  test("streaming curation: dedup within watermark, quality gate, signals attached") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[IncomingDoc]
    val out = CurationStream.curate(input.toDS(), watermarkDelay = "5 minutes", minScore = 0.6)
    val q = out.writeStream.format("memory").queryName("cur1")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        IncomingDoc(ts(0), 1L, goodText, "a"),
        IncomingDoc(ts(0), 2L, "zx qq 11 ##", "a"),       // junk: gated
        IncomingDoc(ts(1), 3L, goodText, "b"))            // dup fingerprint of 1
      q.processAllAvailable()
      // a second micro-batch inside the watermark window: still deduped
      input.addData(IncomingDoc(ts(2), 4L, goodText, "c"))
      q.processAllAvailable()
      val rows = spark.sql("select docId, lang_pred, q_score, fingerprint from cur1").collect()
      val ids = rows.map(_.getLong(0)).toSet
      assert(ids == Set(1L), s"expected only doc 1 to survive, got $ids")
      val r = rows.head
      assert(r.getString(1) == "en")
      assert(r.getDouble(2) >= 0.6)
      // the streaming fingerprint equals the batch operator's
      val batchFp = graft.operators.TextAnalysis
        .withFingerprint(Seq(goodText).toDF("text"), "text")
        .head.getLong(1)
      assert(r.getLong(3) == batchFp)
    } finally q.stop()
  }

  test("streaming curation: a gated first occurrence never consumes the dedup slot") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val padded = goodText + (" " * 25000) // len > 20000 halves the length score
    // same fingerprint (whitespace-normalized), straddling the gate:
    // measure both scores with the batch operator and gate midway, so
    // the padded variant fails and the compact one passes by construction
    val scores = graft.operators.TextAnalysis
      .withQuality(Seq(padded, goodText).toDF("text"), "text")
      .select("q_score").collect().map(_.getDouble(0))
    assert(scores(0) < scores(1), s"padded must score below compact: ${scores.toSeq}")
    val gate = (scores(0) + scores(1)) / 2
    val input = MemoryStream[IncomingDoc]
    val out = CurationStream.curate(input.toDS(), watermarkDelay = "5 minutes", minScore = gate)
    val q = out.writeStream.format("memory").queryName("cur3")
      .outputMode(OutputMode.Append).start()
    try {
      // a gate-failing first occurrence must not suppress the later
      // gate-passing variant with the identical fingerprint
      input.addData(IncomingDoc(ts(0), 1L, padded, "a"))
      q.processAllAvailable()
      input.addData(IncomingDoc(ts(1), 2L, goodText, "a"))
      q.processAllAvailable()
      val ids = spark.sql("select docId from cur3").collect().map(_.getLong(0)).toSet
      assert(ids == Set(2L), s"got $ids")
    } finally q.stop()
  }

  test("streaming curation: state is watermark-bounded (old fingerprints age out)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[IncomingDoc]
    val out = CurationStream.curate(input.toDS(), watermarkDelay = "5 minutes", minScore = 0.0)
    val q = out.writeStream.format("memory").queryName("cur2")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(IncomingDoc(ts(0), 1L, goodText, "a"))
      q.processAllAvailable()
      // advance the watermark far past the window, then re-send the same
      // content: the old fingerprint state has aged out, so the re-send
      // is treated as new (bounded state — the scale guarantee)
      input.addData(IncomingDoc(ts(60), 2L, goodText + " extra watermark push", "a"))
      q.processAllAvailable()
      input.addData(IncomingDoc(ts(61), 3L, goodText, "a"))
      q.processAllAvailable()
      val ids = spark.sql("select docId from cur2").collect().map(_.getLong(0)).toSet
      // dropDuplicatesWithinWatermark only SPECIFIES dedup within the
      // delay; whether an after-expiry duplicate re-emits is
      // implementation timing. Current Spark re-emits doc 3 (the state
      // aged out — the bounded-state evidence); a future version
      // retaining state one extra batch would legally drop it.
      assert(ids == Set(1L, 2L, 3L) || ids == Set(1L, 2L), s"got $ids")
    } finally q.stop()
  }

  test("stateless curation ops compose into streams: c4 lines + PII, batch parity") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val page = "A perfectly good first line.\nhi\nmail me at a@b.org for more details."
    // one chain of stateless projections over the stream — no state, no
    // watermark needed; the same operators run identically in batch
    val streamed = graft.operators.TextAnalysis.redactPii(
      graft.operators.TextAnalysis.c4LineFilter(
        input.toDS().toDF("id", "text"), "text"), "text_filtered")
      .select("id", "n_kept", "text_filtered", "pii_email", "text_redacted")
    val q = streamed.writeStream.format("memory").queryName("cur3")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((1L, page), (2L, "no lines kept here"))
      q.processAllAvailable()
      val got = spark.sql("select * from cur3").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getString(2), r.getLong(3), r.getString(4))))
        .toMap
      val batch = graft.operators.TextAnalysis.redactPii(
        graft.operators.TextAnalysis.c4LineFilter(
          Seq((1L, page), (2L, "no lines kept here")).toDF("id", "text"), "text"),
        "text_filtered")
        .select("id", "n_kept", "text_filtered", "pii_email", "text_redacted")
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getString(2), r.getLong(3), r.getString(4))))
        .toMap
      assert(got == batch, s"stream/batch divergence: $got vs $batch")
      assert(got(1L)._3 == 1L, "expected one redacted email")
      assert(got(1L)._4.contains("<EMAIL>"))
    } finally q.stop()
  }
}
