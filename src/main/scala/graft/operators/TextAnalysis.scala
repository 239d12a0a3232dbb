package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** The whitespace tokenizer every text operator shares — ONE copy,
    * because the snippet is the oracle-parity contract of several
    * DuckDB-verified queries (its DuckDB twin is
    * `list_filter(string_split_regex(text, '\s+'), x -> x <> '')`). */
  private[operators] def toksExpr(textCol: String, lower: Boolean = true): String = {
    val c = if (lower) s"lower($textCol)" else textCol
    s"filter(split($c, '\\\\s+'), x -> x != '')"
  }

  /** Optimizer fence for shared per-row token arrays (the
    * Converters.xpathsUdf idiom): an identity UDF marked
    * nondeterministic, so CollapseProject cannot inline the tokenizer —
    * and whatever constructed the text column under it — into every
    * lambda reference downstream. Without it, a k-gram builder
    * re-tokenizes the document once PER GRAM POSITION (O(tokens²)
    * per row; measured 13.5 s → sub-second on q_dup_spans at sf0.1).
    * Semantics untouched: identity on the array. */
  private[operators] val fencedTokens =
    udf((a: Seq[String]) => a).asNondeterministic()

  /** Sliding k-token windows re-joined with single spaces — exactly the
    * strings `transform(sequence(1, size(t)-k+1), i -> array_join(
    * slice(t, i, k), ' '))` yields, built in one pass. The pure-Column
    * lambda form re-evaluates its token-array reference once PER
    * POSITION (O(tokens²)/row once CollapseProject inlines the
    * tokenizer under it — see [[fencedTokens]]) and costs seconds of
    * whole-stage-codegen compilation; the UDF's argument evaluates once
    * per row. `distinct` keeps first occurrences, like array_distinct. */
  private[operators] def slidingGrams(k: Int, distinct: Boolean = false) =
    udf { (toks: Seq[String]) =>
      if (toks == null || toks.length < k) Array.empty[String]
      else {
        val t = toks.toArray
        val g = Array.tabulate(t.length - k + 1)(i => t.slice(i, i + k).mkString(" "))
        if (distinct) g.distinct else g
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
         |    split(array_join(${toksExpr(textCol)}, ' '), ''),
         |    c -> CAST(ascii(c) AS BIGINT)),
         |  CAST(7919 AS BIGINT),
         |  (acc, x) -> (acc * 31 + x) % 1000000000000037)""".stripMargin))

  // ---- repetition signals (Gopher-style) -------------------------------

  /** Per-document repetition signals from the published Gopher/MassiveText
    * quality rules (Rae et al. 2021, "Scaling Language Models", table A1):
    * duplicate-line fraction, duplicate-paragraph fraction, and the
    * character-weighted variants of both. Lines split on '\n', paragraphs
    * on blank-line boundaries ('\n\n'); both are trimmed and empties
    * dropped. "Duplicate" counts every occurrence beyond the first of an
    * identical line/paragraph, so
    *   dup_frac      = (n - n_distinct) / n
    *   dup_char_frac = (chars(all) - chars(distinct)) / chars(all)
    * Fractions are emitted e6-scaled via floor(x*1e6+0.5) (the engine's
    * usual float-parity form). Everything is higher-order-function Column
    * arithmetic over the split arrays — one codegen'd projection, no
    * shuffle, no UDF; the identical per-row algebra runs in DuckDB with
    * list_* functions.
    *
    * Reference analog: none (GeoMesa has no corpus curation) — this is
    * part of the LLM-pipeline extension the survey calls for. */
  def withRepetition(df: DataFrame, textCol: String): DataFrame = {
    // trim() is space-only on both engines: a residual '\n' segment from
    // an odd blank-line run would survive it as a phantom paragraph and
    // block duplicate matches, so trim WHITESPACE with a regex (the
    // Java/RE2-shared subset; the oracle applies the same pattern)
    def parts(sep: String): String =
      s"""filter(transform(split($textCol, '$sep'),
         |  x -> regexp_replace(x, '^\\\\s+|\\\\s+$$', '')), x -> x != '')""".stripMargin
    def metrics(arr: String, prefix: String): Seq[(String, String)] = Seq(
      s"${prefix}_n" -> s"CAST(size($arr) AS BIGINT)",
      s"${prefix}_dup_frac_e6" ->
        s"""CAST(floor(CASE WHEN size($arr) = 0 THEN 0.0
           |  ELSE (size($arr) - size(array_distinct($arr))) / CAST(size($arr) AS DOUBLE)
           |  END * 1000000 + 0.5) AS BIGINT)""".stripMargin,
      s"${prefix}_dup_char_frac_e6" ->
        s"""CAST(floor(CASE WHEN size($arr) = 0 THEN 0.0
           |  ELSE (aggregate($arr, CAST(0 AS BIGINT), (a, x) -> a + length(x)) -
           |        aggregate(array_distinct($arr), CAST(0 AS BIGINT), (a, x) -> a + length(x))) /
           |       CAST(aggregate($arr, CAST(0 AS BIGINT), (a, x) -> a + length(x)) AS DOUBLE)
           |  END * 1000000 + 0.5) AS BIGINT)""".stripMargin)
    val cols = metrics(parts("\\\\n"), "rep_line") ++ metrics(parts("\\\\n\\\\n"), "rep_para")
    cols.foldLeft(df) { case (d, (name, sql)) => d.withColumn(name, expr(sql)) }
  }

  /** Most-frequent word 2-gram coverage (the Gopher "top n-gram character
    * fraction" rule): for each document, the fraction of its characters
    * covered by all occurrences of its single most frequent word bigram
    * (count × bigram length / total chars, clamped to 1.0 — overlapping
    * occurrences double-count characters). Ties break to the
    * lexicographically smallest bigram so the result is deterministic on
    * any engine.
    *
    * 100-TB shape: bigrams are built per-row with slice/zip_with (no
    * quadratic per-row HOF scan), then explode → hash-aggregate on
    * (id, gram) → one tiny row per distinct gram; the per-document argmax
    * is a second AGGREGATE (min_by over the (-count, gram) order, ties to
    * the smallest gram) — its string buffer makes it a SortAggregate, but
    * unlike a Window it partial-merges map-side, so only one combined row
    * per (doc, gram) crosses the wire. Only (id, frac) joins back; the
    * document payload never enters a shuffle. */
  def withTopBigram(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = toksExpr(textCol)
    val bigrams = df.select(
      col(idCol),
      expr(s"""zip_with(
              |  slice($toks, 1, greatest(size($toks) - 1, 0)),
              |  slice($toks, 2, greatest(size($toks) - 1, 0)),
              |  (a, b) -> concat(a, ' ', b))""".stripMargin).as("__bg"))
      .select(col(idCol), explode(col("__bg")).as("__g"))
      .groupBy(idCol, "__g").agg(count(lit(1)).as("__c"))
    val top = bigrams
      .groupBy(idCol)
      .agg(min_by(struct(col("__g"), col("__c")), struct(-col("__c"), col("__g"))).as("__t"))
      .select(col(idCol), col("__t.__g").as("top_bigram"), col("__t.__c").as("top_bigram_count"))
    df.join(top, Seq(idCol), "left")
      .withColumn("top_bigram_char_frac_e6", expr(
        // count*length double-counts overlapping occurrences ('x x x'
        // has 'x x' twice over 5 chars), so clamp: this is a fraction
        s"""CAST(floor(LEAST(1.0, CASE WHEN top_bigram IS NULL OR length($textCol) = 0 THEN 0.0
           |  ELSE top_bigram_count * length(top_bigram) / CAST(length($textCol) AS DOUBLE)
           |  END) * 1000000 + 0.5) AS BIGINT)""".stripMargin))
      .withColumn("top_bigram_count", coalesce(col("top_bigram_count"), lit(0L)))
  }

  // ---- document chunking ------------------------------------------------

  /** Split documents into fixed-size token windows with overlap — the
    * chunking step a pretraining/RAG pipeline runs before embedding or
    * packing. Chunk starts step by `maxTokens - overlap`; the last chunk
    * keeps whatever remains, except that a trailing window whose tokens
    * are ALL already covered by the previous chunk is not emitted (with
    * overlap, a short tail can be a strict suffix of its predecessor).
    * Empty documents produce no chunks.
    *
    * Pure plan: tokens array → `sequence` of starts → explode (codegen
    * Generate) → slice/array_join. One projection + one generator, no
    * shuffle, no UDF; the chunk id is (start-1)/step so it is dense and
    * deterministic.
    *
    * Output: `idCol`, `chunk_id` (0-based), `chunk_text`,
    * `chunk_tokens`. */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
                maxTokens: Int, overlap: Int = 0): DataFrame = {
    require(maxTokens >= 1, "maxTokens must be >= 1")
    require(overlap >= 0 && overlap < maxTokens, "overlap must be in [0, maxTokens)")
    val step = maxTokens - overlap
    val toks = toksExpr(textCol, lower = false)
    df.select(col(idCol), expr(toks).as("__t"))
      .where(size(col("__t")) > 0)
      .select(col(idCol), col("__t"),
        explode(expr(s"sequence(1, size(__t), $step)")).as("__s"))
      // drop a tail window whose content the previous chunk fully covers:
      // previous end = __s - step + maxTokens - 1 >= size(t) simplifies
      // (step = maxTokens - overlap) to __s + overlap > size(t)
      .where(col("__s") === 1 || col("__s") + lit(overlap) <= size(col("__t")))
      .select(
        col(idCol),
        expr(s"CAST((__s - 1) div $step AS BIGINT)").as("chunk_id"),
        expr(s"array_join(slice(__t, __s, $maxTokens), ' ')").as("chunk_text"),
        expr(s"CAST(least($maxTokens, size(__t) - __s + 1) AS BIGINT)").as("chunk_tokens"))
  }

  // ---- corpus-level n-gram statistics ----------------------------------

  /** Corpus-wide top-K word n-grams — the boilerplate/template detector:
    * the most frequent n-grams across the WHOLE corpus (with document
    * frequency alongside raw count) surface navigation chrome, cookie
    * banners and licence headers that per-document signals cannot see.
    *
    * 100-TB shape: ONE corpus pass — grams are built per-row
    * (slice/transform), explode feeds a first hash aggregate on
    * (doc, gram) (map-side partial: in-doc repeats combine before any
    * shuffle), a second hash aggregate on the gram alone folds that into
    * occurrence count + document frequency, and the global top-K is
    * TakeOrdered (per-partition top-K merged on the driver, never a full
    * sort). Ties break to the lexicographically smaller gram.
    *
    * Output: `gram`, `n_occurrences` (every occurrence), `n_docs`
    * (documents containing it at least once), ordered by
    * (n_occurrences desc, gram asc), limited to `k`. */
  def corpusTopGrams(df: DataFrame, idCol: String, textCol: String,
                     n: Int = 3, k: Int = 100): DataFrame = {
    require(n >= 1 && k >= 1, "n and k must be >= 1")
    df.select(col(idCol), explode(slidingGrams(n)(expr(toksExpr(textCol)))).as("gram"))
      .groupBy(col(idCol), col("gram")).agg(count(lit(1)).as("__c"))
      .groupBy("gram")
      .agg(sum(col("__c")).as("n_occurrences"), count(lit(1)).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("gram").asc)
      .limit(k)
  }

  // ---- line-wise corrections ------------------------------------------

  /**
   * C4-style line filtering (Raffel et al. 2020 §2.2, kept by
   * RefinedWeb's "line-wise corrections"): lines are whitespace-trimmed,
   * empty lines drop, and each surviving line must (1) have at least
   * `minWords` words, (2) end in a terminal punctuation mark
   * (`.` `!` `?` `"`), (3) not mention "javascript". A line failing
   * several rules is counted ONCE under the first failing rule (that
   * order) so counts and filtered text are one deterministic story.
   * Document-level C4 flags ride along: "lorem ipsum" and curly-brace
   * page markers, and `page_keep` (enough kept lines AND neither flag).
   *
   * One projection, no shuffle (the line split sits behind the
   * [[fencedTokens]] optimizer fence so it runs once per row); the
   * identical construction runs in the DuckDB oracle.
   *
   * Output: input columns + `n_lines`, `n_kept`, `dropped_short`,
   * `dropped_no_punct`, `dropped_js`, `has_lorem`, `has_brace`,
   * `page_keep`, `text_filtered` (kept lines re-joined with \n).
   */
  def c4LineFilter(df: DataFrame, textCol: String,
                   minWords: Int = 3, minKeptLines: Int = 3): DataFrame = {
    val nl = "chr(10)"
    // null text reports zero lines/counts and an empty text_filtered —
    // the family-wide null-document convention (duplicationStats): an
    // un-coalesced split(NULL) would make size() report -1 under the
    // default legacy conf and null out every downstream counter
    val t = s"coalesce($textCol, '')"
    val lines =
      s"""filter(transform(split($t, $nl),
         |  x -> regexp_replace(x, '^\\\\s+|\\\\s+$$', '')), x -> x != '')""".stripMargin
    // rule class per line: 0 keep, 1 short, 2 no terminal punct, 3 js
    val cls =
      s"""transform(__lines, x -> CASE
         |  WHEN size(filter(split(x, '\\\\s+'), w -> w != '')) < $minWords THEN 1
         |  WHEN NOT x RLIKE '[.!?"]$$' THEN 2
         |  WHEN lower(x) LIKE '%javascript%' THEN 3
         |  ELSE 0 END)""".stripMargin
    // fencedTokens: the line array feeds n_lines, the classifier and the
    // rebuild — without the fence CollapseProject re-splits the document
    // once per consumer
    df.withColumn("__lines", fencedTokens(expr(lines)))
      .withColumn("__cls", expr(cls))
      .withColumn("n_lines", expr("CAST(size(__lines) AS BIGINT)"))
      .withColumn("n_kept", expr("CAST(size(filter(__cls, c -> c = 0)) AS BIGINT)"))
      .withColumn("dropped_short", expr("CAST(size(filter(__cls, c -> c = 1)) AS BIGINT)"))
      .withColumn("dropped_no_punct", expr("CAST(size(filter(__cls, c -> c = 2)) AS BIGINT)"))
      .withColumn("dropped_js", expr("CAST(size(filter(__cls, c -> c = 3)) AS BIGINT)"))
      .withColumn("has_lorem", expr(s"lower($t) LIKE '%lorem ipsum%'"))
      .withColumn("has_brace", expr(s"contains($t, '{')"))
      .withColumn("page_keep",
        expr(s"n_kept >= $minKeptLines AND NOT has_lorem AND NOT has_brace"))
      .withColumn("text_filtered", expr(
        s"""array_join(filter(zip_with(__lines, __cls,
           |  (x, c) -> CASE WHEN c = 0 THEN x END), x -> x IS NOT NULL), $nl)""".stripMargin))
      .drop("__lines", "__cls")
  }

  /**
   * Corpus-wide exact line dedup (the RefinedWeb / MassiveText
   * line-level pass): count every whitespace-trimmed non-empty line
   * across the corpus, and remove ALL occurrences of lines appearing
   * >= `minCount` times (navigation menus, cookie banners, license
   * headers). Line keys are case-sensitive exact content — the
   * fuzzy/lowercased analog is [[graft.operators.Dedup.duplicateSpans]].
   *
   * 100-TB shape: the only corpus-sized shuffle is the (line, count)
   * hash aggregate (map-side combined); the duplicated-line table joins
   * back against exploded positions (output proportional to duplicated
   * text), and each document rebuilds from its surviving lines with one
   * per-document aggregate — no window, no global sort.
   *
   * Output: one row per document — `n_lines`, `n_dropped`, and
   * `text_deduped` (surviving lines re-joined with \n; whitespace-only
   * normalization is NOT undone: trimmed lines are what survives).
   */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
                 minCount: Int = 2,
                 scope: CacheScope = CacheScope.untracked): DataFrame = {
    require(minCount >= 2, "a line is duplicated only from 2 occurrences up")
    val lines =
      s"""filter(transform(split($textCol, chr(10)),
         |  x -> regexp_replace(x, '^\\\\s+|\\\\s+$$', '')), x -> x != '')""".stripMargin
    // the exploded line stream feeds the count aggregate and the dup
    // probe — cached (the duplicateSpans idiom) for one split pass;
    // lifetime is the caller's via `scope` (see CacheScope)
    val exploded = scope.cache(
      df.select(col(idCol), posexplode(expr(lines)).as(Seq("__pos", "__line"))))
    val dup = exploded.groupBy("__line").agg(count(lit(1)).as("__c"))
      .where(col("__c") >= minCount).select(col("__line"), lit(true).as("__dup"))
    val perDoc = exploded.join(dup, Seq("__line"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("__dup"), 1L).otherwise(0L)).as("n_dropped"),
        array_join(transform(array_sort(collect_list(
            when(!coalesce(col("__dup"), lit(false)),
              struct(col("__pos"), col("__line"))))),
          s => s.getField("__line")), "\n").as("text_deduped"))
    // precondition (like the dedup family): idCol uniquely identifies
    // rows; line-less documents survive with an empty result
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        coalesce(col("text_deduped"), lit("")).as("text_deduped"))
  }

  // ---- n-gram language-model scoring ----------------------------------

  /**
   * N-gram language-model scoring — the CCNet / Wenzek et al. 2019
   * perplexity filter, with the KenLM model re-expressed as distributed
   * bigram counts: train add-one-smoothed bigram probabilities
   * p(w2|w1) = (c(w1 w2) + 1) / (c(w1 ·) + V) over a reference corpus
   * (`lm`, defaulting to the input itself) in one aggregate pass, then
   * score each document by its mean negative log-likelihood per bigram.
   * Low score = fluent/common text, high = gibberish; CCNet buckets the
   * corpus into head/middle/tail by exactly this number. Bigrams the
   * model never saw get the unseen mass (c12 = 0, and c1 = 0 for an
   * unknown first word).
   *
   * Parity contract: each bigram type's ln p is rounded to 1e-6 and the
   * per-document aggregate sums those INTEGERS, so it is independent of
   * partition order and the DuckDB oracle reproduces it bit-exactly
   * (raw double sums are order-dependent; libm ln differs by ~1 ulp
   * between engines — six orders of magnitude inside the rounding
   * margin).
   *
   * 100-TB shape: counts are hash aggregates with map-side combine; the
   * score join shuffles on the gram key with per-document
   * multiplicities pre-combined (one row per distinct (doc, bigram));
   * no window, no sort. V (distinct continuation count) is one bounded
   * driver scalar.
   *
   * Output: one row per document — `n_bigrams` (token bigrams scored),
   * `lnp_e6_sum` (sum of 1e6-scaled ln p, an exact integer) and
   * `avg_nll_e6` (mean negative log-likelihood, 1e6-scaled; null for
   * docs with < 2 tokens).
   *
   * Evaluation note: CONSTRUCTION IS EAGER — the V scalar (distinct
   * continuation count) runs one Spark job over the LM corpus before
   * this returns, and the bigram-type table is cached for the result
   * plan to consume. Pass a [[CacheScope]] and `unpersistAll` after
   * materializing to bound cache lifetime in long-running apps.
   */
  def lmScore(df: DataFrame, idCol: String, textCol: String,
              lm: Option[(DataFrame, String)] = None,
              scope: CacheScope = CacheScope.untracked): DataFrame = {
    def bigrams(src: DataFrame, cols: Seq[Column], textC: String): DataFrame = {
      val toks = toksExpr(textC)
      src.select(cols :+ explode(expr(
        s"""CASE WHEN size($toks) < 2 THEN array()
           |ELSE zip_with(slice($toks, 1, size($toks) - 1),
           |  slice($toks, 2, size($toks) - 1),
           |  (a, b) -> struct(a AS w1, b AS w2)) END""".stripMargin)).as("__b"): _*)
        .select(cols ++ Seq(col("__b.w1").as("__w1"), col("__b.w2").as("__w2")): _*)
    }
    val (lmDf, lmText) = lm.getOrElse((df, textCol))
    val lmBi = bigrams(lmDf, Seq.empty, lmText)
    // the bigram-type table feeds c1, the V scalar and the score join —
    // cache it (bounded by vocab², far smaller than the corpus) so the
    // LM-corpus gram build runs one pass instead of four
    val c12 = scope.cache(lmBi.groupBy("__w1", "__w2").agg(count(lit(1)).as("__c12")))
    val c1 = c12.groupBy("__w1").agg(sum("__c12").as("__c1"))
    val v = c12.select("__w2").distinct().count()
    require(v > 0, "LM corpus has no bigrams")
    val docBi = bigrams(df, Seq(col(idCol)), textCol)
      .groupBy(col(idCol), col("__w1"), col("__w2")).agg(count(lit(1)).as("__m"))
    val lnp =
      s"""CAST(floor(ln((CAST(coalesce(__c12, 0) AS DOUBLE) + 1.0) /
         |  (CAST(coalesce(__c1, 0) AS DOUBLE) + CAST($v AS DOUBLE))) * 1000000 + 0.5)
         |AS BIGINT)""".stripMargin
    val perDoc = docBi
      .join(c12, Seq("__w1", "__w2"), "left")
      .join(c1, Seq("__w1"), "left")
      .withColumn("__lnp", expr(lnp))
      .groupBy(idCol)
      .agg(sum("__m").as("n_bigrams"), sum(col("__m") * col("__lnp")).as("lnp_e6_sum"))
    // precondition (like the dedup family): idCol uniquely identifies rows
    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lnp_e6_sum"), lit(0L)).as("lnp_e6_sum"),
        expr(
          """CASE WHEN n_bigrams IS NULL THEN NULL
            |ELSE CAST(floor(-CAST(lnp_e6_sum AS DOUBLE) / n_bigrams + 0.5) AS BIGINT)
            |END""".stripMargin).as("avg_nll_e6"))
  }

  // ---- TF-IDF ----------------------------------------------------------

  /**
   * TF-IDF top terms per document — the classic corpus vectorizer
   * (here with sklearn's smoothed idf: ln((N+1)/(df_t+1)) + 1): term
   * frequency per document, document frequency per term, and each
   * document's `k` highest-weighted terms. The top-term set is what
   * keyword extraction / near-dup blocking / topic labeling consume;
   * the full weighted vector is the same plan minus the rank filter.
   *
   * Parity contract (as in [[lmScore]]): idf rounds to a 1e-6 integer
   * per TERM before the tf multiply, so weights are exact integers and
   * rank order is engine-independent; ties break to the
   * lexicographically smaller term.
   *
   * 100-TB shape: two hash aggregates (doc-term counts with map-side
   * combine; term document-frequency folded from it), the idf table
   * joins back on the term key, and the per-document top-k is a window
   * partitioned by document — no global sort. N (total docs) is one
   * bounded driver scalar.
   *
   * Output: (idCol, term, tf, df_t, weight_e6, rank), rank 1..k per doc.
   *
   * Evaluation note: CONSTRUCTION IS EAGER — the N scalar (total docs)
   * runs one Spark job before this returns, and two narrow
   * intermediates are cached for the result plan. Pass a [[CacheScope]]
   * and `unpersistAll` after materializing to bound cache lifetime.
   */
  def tfIdfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    k: Int = 5,
                    scope: CacheScope = CacheScope.untracked): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // materialize the narrow projection once: the eager N count and the
    // term build would otherwise each evaluate the full upstream plan
    val base = scope.cache(df.select(col(idCol), col(textCol)))
    val n = base.count()
    require(n > 0, "empty corpus")
    // doc-term counts feed both the document-frequency fold and the
    // weight join — cache so the tokenize+explode runs one pass
    val terms = scope.cache(
      base.select(col(idCol), explode(expr(toksExpr(textCol))).as("term"))
        .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf")))
    val docFreq = terms.groupBy("term").agg(count(lit(1)).as("df_t"))
      .withColumn("idf_e6", expr(
        s"""CAST(floor((ln((CAST($n AS DOUBLE) + 1.0) / (CAST(df_t AS DOUBLE) + 1.0)) + 1.0)
           |  * 1000000 + 0.5) AS BIGINT)""".stripMargin))
    terms.join(docFreq, "term")
      .withColumn("weight_e6", col("tf") * col("idf_e6"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(idCol).orderBy(col("weight_e6").desc, col("term").asc)))
      .where(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df_t"),
        col("weight_e6"), col("rank").cast("long").as("rank"))
  }

  // ---- PII redaction ----------------------------------------------------

  /** The redaction categories, in application order (most specific
    * first so e.g. an SSN is not half-eaten by the phone rule). Patterns
    * deliberately use only the regex subset with identical semantics in
    * Java regex (Spark codegen) and RE2 (the DuckDB oracle): character
    * classes, bounded repetition, alternation-free groups, ASCII \b —
    * no lookaround, no backreferences. */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn",   "\\b\\d{3}-\\d{2}-\\d{4}\\b",                      "<SSN>"),
    ("card",  "\\b\\d{4}[- ]\\d{4}[- ]\\d{4}[- ]\\d{4}\\b",      "<CARD>"),
    ("ip",    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phone", "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b",              "<PHONE>"))

  /** PII scrubbing — the redaction pass every published curation
    * pipeline runs before training (emails, SSNs, card numbers, IPs,
    * phone numbers → typed placeholder tokens). Redactions apply
    * sequentially in [[PiiPatterns]] order; each category's count is
    * taken on the text as it stands when that rule runs, so counts and
    * redacted text are one deterministic story on any engine. Pure
    * codegen projection (regexp_count/regexp_replace), no UDF, no
    * shuffle.
    *
    * Output: input columns + `text_redacted`, `pii_<category>` count per
    * category, and `pii_total`. */
  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    val start = df.withColumn("text_redacted", col(textCol))
    val out = PiiPatterns.foldLeft(start) { case (d, (name, pat, repl)) =>
      d.withColumn(s"pii_$name", regexp_count(col("text_redacted"), lit(pat)).cast("long"))
        .withColumn("text_redacted", regexp_replace(col("text_redacted"), lit(pat), lit(repl)))
    }
    out.withColumn("pii_total", PiiPatterns.map(p => col(s"pii_${p._1}")).reduce(_ + _))
  }

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
