package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text analysis operators for training-data curation: language id,
 * quality scoring, tokenization, and document fingerprinting. All are
 * per-row scalar transforms (embarrassingly parallel, codegen-adjacent
 * UDFs) — no shuffles.
 */
object TextAnalysis {

  // ---- language id (character n-gram + stopword heuristic) ------------

  private val profiles: Map[String, (Set[String], Set[String])] = Map(
    // (very common words, frequent trigrams) per language — tiny
    // profiles; a production system would ship larger tables, the
    // operator shape is identical
    "en" -> (Set("the", "and", "of", "to", "in", "is", "that", "for", "with", "it"),
             Set("the", "ing", "and", "ion", "ent")),
    "es" -> (Set("el", "la", "de", "que", "y", "en", "los", "del", "se", "las"),
             Set("que", "ent", "con", "ado", "cio")),
    "de" -> (Set("der", "die", "und", "das", "ist", "den", "von", "mit", "sich", "auf"),
             Set("der", "ein", "ich", "sch", "und")),
    "fr" -> (Set("le", "la", "de", "et", "les", "des", "est", "une", "dans", "que"),
             Set("les", "ent", "que", "ion", "ait")))

  private val langIdUdf = udf { (text: String) =>
    if (text == null || text.isEmpty) "und"
    else {
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val tris = text.toLowerCase.filter(c => c.isLetter || c == ' ')
        .sliding(3).filterNot(_.contains(' ')).toSeq
      val scored = profiles.toSeq.map { case (lang, (words, grams)) =>
        val ws = toks.count(words.contains).toDouble / math.max(1, toks.length)
        val gs = tris.count(grams.contains).toDouble / math.max(1, tris.size)
        lang -> (2 * ws + gs)
      }
      val (best, score) = scored.maxBy { case (l, s) => (s, l) }
      if (score <= 0) "und" else best
    }
  }

  def withLangId(df: DataFrame, textCol: String, outCol: String = "lang_pred"): DataFrame =
    df.withColumn(outCol, langIdUdf(col(textCol)))

  // ---- quality scoring ------------------------------------------------

  /** Length / punctuation / digit / stopword / repetition signals plus a
    * composite score in [0,1] — the usual pre-training quality filters. */
  def withQuality(df: DataFrame, textCol: String): DataFrame = {
    val q = udf { (text: String) =>
      if (text == null) null
      else {
        val len = text.length
        val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        val n = math.max(1, toks.length)
        val punct = text.count(c => !c.isLetterOrDigit && !c.isWhitespace).toDouble / math.max(1, len)
        val digits = text.count(_.isDigit).toDouble / math.max(1, len)
        val stop = toks.count(profiles("en")._1.contains).toDouble / n
        val uniq = toks.distinct.length.toDouble / n
        val meanWord = toks.map(_.length).sum.toDouble / n
        val lenScore = math.min(1.0, len / 200.0) * (if (len > 20000) 0.5 else 1.0)
        val composite = math.max(0.0, math.min(1.0,
          0.3 * lenScore + 0.25 * uniq + 0.2 * (1 - punct * 4) +
            0.15 * math.min(1.0, meanWord / 6.0) + 0.1 * (1 - digits * 2)))
        (len, n, punct, digits, stop, uniq, meanWord, composite)
      }
    }
    df.withColumn("__q", q(col(textCol)))
      .withColumn("q_chars", col("__q._1"))
      .withColumn("q_words", col("__q._2"))
      .withColumn("q_punct_ratio", col("__q._3"))
      .withColumn("q_digit_ratio", col("__q._4"))
      .withColumn("q_stopword_ratio", col("__q._5"))
      .withColumn("q_uniq_ratio", col("__q._6"))
      .withColumn("q_mean_word_len", col("__q._7"))
      .withColumn("q_score", col("__q._8"))
      .drop("__q")
  }

  // ---- tokenization ---------------------------------------------------

  /** Whitespace token count (cheap) and BPE-ish subword count: letters
    * runs, digit runs, and single punctuation as separate tokens, long
    * words split every 4 chars (the usual ~chars/4 BPE approximation). */
  def withTokenCounts(df: DataFrame, textCol: String): DataFrame = {
    val bpeish = udf { (text: String) =>
      if (text == null) null
      else {
        val m = java.util.regex.Pattern
          .compile("[\\p{L}]+|[\\p{N}]+|[^\\s\\p{L}\\p{N}]").matcher(text)
        var n = 0L
        while (m.find()) {
          val len = m.group().length
          n += math.max(1, (len + 3) / 4)
        }
        java.lang.Long.valueOf(n)
      }
    }
    df.withColumn("n_ws_tokens", size(split(col(textCol), "\\s+")).cast("long"))
      .withColumn("n_bpe_tokens", bpeish(col(textCol)))
  }

  // ---- fingerprinting -------------------------------------------------

  /** Polynomial rolling hash (Rabin-Karp, base 31 mod a 50-bit prime) of
    * the case/whitespace-normalized text — an order-sensitive
    * exact-content fingerprint (cheap first stage before MinHash).
    * Implemented as a pure SQL expression: stays inside whole-stage
    * codegen (no UDF), and the identical ANSI expression is the DuckDB
    * oracle. The modulus keeps acc*31+char < 2^63 so the arithmetic is
    * exact (no wrapping) on any engine. */
  def withFingerprint(df: DataFrame, textCol: String, outCol: String = "fingerprint"): DataFrame =
    df.withColumn(outCol, expr(
      s"""aggregate(
         |  transform(
         |    split(array_join(filter(split(lower($textCol), '\\\\s+'), x -> x != ''), ' '), ''),
         |    c -> CAST(ascii(c) AS BIGINT)),
         |  CAST(7919 AS BIGINT),
         |  (acc, x) -> (acc * 31 + x) % 1000000000000037)""".stripMargin))

  // ---- composite corpus cleaning --------------------------------------

  /** The canonical pre-training corpus-cleaning pipeline as ONE plan:
    * language gate + quality gate + exact dedup + fingerprint near-dedup,
    * returning every document's fate:
    *
    *   'gate'      — failed the language/length/quality filters
    *   'exact_dup' — survived the gate but byte-identical text already
    *                 kept under a lower id (strict raw-text key)
    *   'near_dup'  — exact-canonical, but its case/whitespace-normalized
    *                 rolling-hash fingerprint already kept under a lower id
    *   'kept'      — the surviving corpus
    *
    * 100-TB shape: all per-row features (lang id, quality, fingerprint,
    * md5 exact key) are computed in a single projection pass over the
    * scan, and the payload column is DROPPED before the first exchange —
    * the two dedup shuffles (by exact key, then by fingerprint) carry
    * ~50-byte rows regardless of document size. Canonical choice is
    * min(id) per group, the same ownership rule the spatial join uses
    * (no global distinct, no driver collect).
    *
    * Reference analog: the tail end of an ingest converter chain plus
    * UniqueProcess (reference process/unique/UniqueProcess.scala) — the
    * reference has no built-in corpus cleaner; this is the LLM-pipeline
    * extension the survey calls for. */
  def cleanCorpus(df: DataFrame, idCol: String, textCol: String,
                  minChars: Long, minWords: Long, minScoreE6: Long,
                  langs: Seq[String]): DataFrame = {
    val feat = withFingerprint(withQuality(withLangId(df, textCol), textCol), textCol)
      .withColumn("__exact_key", md5(col(textCol)))
      .select(col(idCol), col("lang_pred"), col("q_chars"), col("q_words"),
        expr("CAST(floor(q_score * 1000000 + 0.5) AS BIGINT)").as("q_score_e6"),
        col("fingerprint"), col("__exact_key"))
    val gate = col("q_chars") >= minChars && col("q_words") >= minWords &&
      col("q_score_e6") >= minScoreE6 && col("lang_pred").isInCollection(langs)
    // Canonical election is groupBy-min + equi-join, NOT a window: a
    // window sorts each key group inside ONE task, so a hot key (a
    // billion identical boilerplate docs) becomes a single-task
    // bottleneck with no mitigation. The hash aggregate collapses hot
    // keys map-side before its shuffle, and AQE's skew-join split
    // handles the join back. The plan carries the feature projection
    // three times (main branch + each canon table) — deliberate: the
    // per-row features are linear map work, while caching the projected
    // corpus at real scale would pin tens of TB. __pass coalesces a
    // NULL gate (null/absent text nulls every feature) to false so such
    // rows are 'gate', never 'kept'.
    val tagged = feat.withColumn("__pass", coalesce(gate, lit(false)))
    val eCanon = tagged.where(col("__pass"))
      .groupBy("__exact_key").agg(min(idCol).as("__e"))
    val fCanon = tagged.where(col("__pass"))
      .join(eCanon, Seq("__exact_key"))
      .where(col(idCol) === col("__e"))
      .groupBy("fingerprint").agg(min(idCol).as("__f"))
    tagged
      .join(eCanon, Seq("__exact_key"), "left")
      .join(fCanon, Seq("fingerprint"), "left")
      .withColumn("fate",
        when(!col("__pass"), "gate")
          .when(col(idCol) =!= col("__e"), "exact_dup")
          .when(col(idCol) =!= col("__f"), "near_dup")
          .otherwise("kept"))
      .select(col(idCol), col("lang_pred"), col("fate"))
  }
}
