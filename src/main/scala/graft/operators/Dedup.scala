package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.images.SyntheticImages.mix

/**
 * Deduplication operators for large-scale training-data curation.
 * All of them follow the same scale pattern: signature -> band/bucket ->
 * equi-join candidates inside buckets only -> exact verify. The full
 * cross product never materializes; every stage is a hash shuffle on a
 * bucket key, so AQE/skew handling applies as usual.
 */
object Dedup {

  // ---- exact ---------------------------------------------------------

  /** Exact dedup: canonical row per distinct content (hash-groupBy). */
  def exact(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(contentCol)
      .agg(min(idCol).as("canonical_id"), count(lit(1)).as("n_dups"))

  /** Exact-dedup filter: keep only each content's canonical row. */
  def dropExactDuplicates(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val canon = exact(df, idCol, contentCol).select(col("canonical_id").as(idCol))
    df.join(canon, idCol)
  }

  // ---- MinHash + LSH --------------------------------------------------

  /** Word w-shingles hashed to 64-bit via splitmix64. */
  private def shingles(text: String, w: Int): Array[Long] = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.length < w) Array(mix(toks.mkString(" ").hashCode.toLong))
    else toks.sliding(w).map(s => mix(s.mkString(" ").hashCode.toLong * 31 + s.length)).toArray
  }

  /** numHashes-wide MinHash signature: h_i(s) = mix(s ^ seed_i). */
  private def minhashSig(text: String, w: Int, numHashes: Int): Array[Long] = {
    val sh = shingles(text, w)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      var j = 0
      while (j < numHashes) {
        val h = mix(sh(i) ^ mix(j.toLong * 0x9e3779b97f4a7c15L))
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    sig
  }

  private def sigUdf(w: Int, numHashes: Int) =
    udf((text: String) => if (text == null) null else minhashSig(text, w, numHashes))

  /** Estimated Jaccard from two signatures = fraction of equal slots.
    * (toArray first: Spark hands UDFs a List for array columns, and
    * indexed List access is O(i) — see Ann.signature.) */
  private val estJaccard = udf { (as: Seq[Long], bs: Seq[Long]) =>
    val a = as.toArray; val b = bs.toArray
    var eq = 0
    var i = 0
    while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / a.length
  }

  /** Drop LSH buckets larger than `maxBucket` rows — the quadratic
    * guard. A degenerate band key (e.g. the constant signature of empty
    * text) would otherwise create one bucket whose self-join is
    * |bucket|^2; at billions of rows that single bucket dominates the
    * job. Pairs only found in oversized buckets are sacrificed —
    * equivalent to the reference capping scan-range fan-out — and the
    * count of dropped buckets is available via `oversizedBuckets`. */
  private[operators] def capBuckets(banded: DataFrame, keyCols: Seq[String],
                                    maxBucket: Int): DataFrame = {
    if (maxBucket <= 0) banded
    else {
      val counts = banded.groupBy(keyCols.map(col): _*).count()
        .where(col("count") <= maxBucket).drop("count")
      banded.join(counts, keyCols)
    }
  }

  /** Buckets that the cap would drop (for auditing a corpus). */
  def oversizedBuckets(banded: DataFrame, keyCols: Seq[String], maxBucket: Int): DataFrame =
    banded.groupBy(keyCols.map(col): _*).count().where(col("count") > maxBucket)

  /**
   * MinHash-LSH near-duplicate pairs: shingle -> minhash -> band ->
   * bucket-join -> signature-level Jaccard estimate filter.
   *
   * Scale shape (the 100 TB-shaped plan):
   *  1. banding carries (band, bucket, id) ONLY — ~16 bytes/row through
   *     the bucket shuffle instead of the 64-long signature;
   *  2. candidate pairs dedup on ids alone (`groupBy(id1, id2)`);
   *  3. signatures re-join per UNIQUE pair and the Jaccard estimate is
   *     computed once per pair — not once per colliding band (an exact
   *     duplicate collides in all 16 bands; computing the metric per
   *     collision multiplies the work 16x).
   * The (id, signature) projection is persisted (memory-and-disk,
   * evictable) so the shingle+hash UDF — the dominant CPU cost — runs
   * ONE pass over the corpus instead of once for banding plus once per
   * re-join branch. Buckets over `maxBucket` rows are dropped
   * (capBuckets) so no degenerate key goes quadratic.
   */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double = 0.7, w: Int = 3,
                   numHashes: Int = 64, bands: Int = 16,
                   maxBucket: Int = 4096,
                   scope: CacheScope = CacheScope.untracked): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val sig = scope.cache(
      df.select(col(idCol).as("id"), sigUdf(w, numHashes)(col(textCol)).as("sig")))
    val banded0 = sig.select(col("id"), col("sig"),
      posexplode(sequence(lit(0), lit(bands - 1))).as(Seq("__p", "band")))
      .withColumn("bucket", hash(col("band"), slice(col("sig"), col("band") * rowsPerBand + 1, lit(rowsPerBand))))
      .select("id", "band", "bucket") // ids only through the shuffle
    val banded = capBuckets(banded0, Seq("band", "bucket"), maxBucket)
    val l = banded.select(col("band"), col("bucket"), col("id").as("id1"))
    val r = banded.select(col("band"), col("bucket"), col("id").as("id2"))
    val pairs = l.join(r, Seq("band", "bucket")).where(col("id1") < col("id2"))
      .select("id1", "id2").groupBy("id1", "id2").agg(count(lit(1)).as("__nb"))
      .drop("__nb")
    pairs
      .join(sig.select(col("id").as("id1"), col("sig").as("sig1")), "id1")
      .join(sig.select(col("id").as("id2"), col("sig").as("sig2")), "id2")
      .withColumn("est_jaccard", estJaccard(col("sig1"), col("sig2")))
      .where(col("est_jaccard") >= threshold)
      .select("id1", "id2", "est_jaccard")
  }

  // ---- n-gram Jaccard (exact verify) ----------------------------------

  private def jaccardExactUdf(w: Int) = udf { (a: String, b: String) =>
    val sa = shingles(a, w).toSet
    val sb = shingles(b, w).toSet
    if (sa.isEmpty && sb.isEmpty) 1.0
    else sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  /** LSH candidates verified with exact n-gram Jaccard (two-stage dedup). */
  def nearDuplicates(df: DataFrame, idCol: String, textCol: String,
                     threshold: Double = 0.8, w: Int = 3): DataFrame = {
    val cand = minhashPairs(df, idCol, textCol, threshold * 0.75, w)
    val t = df.select(col(idCol).as("__id"), col(textCol).as("__text"))
    cand
      .join(t.withColumnRenamed("__id", "id1").withColumnRenamed("__text", "text1"), "id1")
      .join(t.withColumnRenamed("__id", "id2").withColumnRenamed("__text", "text2"), "id2")
      .withColumn("jaccard", jaccardExactUdf(w)(col("text1"), col("text2")))
      .where(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
  }

  // ---- SimHash --------------------------------------------------------

  /** 64-bit SimHash over token hashes (Charikar): per-bit weighted vote. */
  private val simhashUdf = udf { (text: String) =>
    if (text == null) null
    else {
      val votes = new Array[Int](64)
      text.toLowerCase.split("\\s+").filter(_.nonEmpty).foreach { tok =>
        val h = mix(tok.hashCode.toLong)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
      java.lang.Long.valueOf(out)
    }
  }

  def withSimhash(df: DataFrame, textCol: String, outCol: String = "simhash"): DataFrame =
    df.withColumn(outCol, simhashUdf(col(textCol)))

  /**
   * SimHash near-dup pairs with Hamming distance <= maxDist, using the
   * pigeonhole block trick: split 64 bits into (maxDist+1) blocks; any
   * pair within maxDist shares at least one exact block -> equi-join per
   * block, verify Hamming. Same banding idea the reference applies to
   * Z-ranges: coarse exact-match buckets + precise refine.
   */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 3, maxBucket: Int = 4096): DataFrame =
    hammingPairs(
      withSimhash(df.select(col(idCol).as("id"), col(textCol)), textCol),
      "id", "simhash", maxDist, maxBucket)

  /**
   * Generic Hamming-distance pair finder over any 64-bit hash column —
   * the shared machinery behind simhashPairs and the image phashPairs.
   * Pigeonhole-exact: bits split into (maxDist+1) blocks, any pair
   * within maxDist shares >= 1 exact block; equi-join per block, verify
   * with bit_count(xor). Hamming computed + thresholded pre-dedup so the
   * pair shuffle carries ids + one int, and non-near pairs never
   * shuffle; oversized buckets dropped (capBuckets).
   */
  def hammingPairs(df: DataFrame, idCol: String, hashCol: String,
                   maxDist: Int, maxBucket: Int = 4096): DataFrame = {
    val blocks = maxDist + 1
    val width = 64 / blocks
    val blockKey = udf { (h: Long, b: Int) =>
      val shift = b * width
      val w = if (b == blocks - 1) 64 - shift else width
      (h >>> shift) & ((1L << w) - 1)
    }
    val banded = capBuckets(
      df.select(col(idCol).as("__hid"), col(hashCol).as("__h"))
        .withColumn("block", explode(sequence(lit(0), lit(blocks - 1))))
        .withColumn("key", blockKey(col("__h"), col("block"))),
      Seq("block", "key"), maxBucket)
    val l = banded.select(col("block"), col("key"), col("__hid").as("id1"), col("__h").as("h1"))
    val r = banded.select(col("block"), col("key"), col("__hid").as("id2"), col("__h").as("h2"))
    val hamming = udf((a: Long, b: Long) => java.lang.Long.bitCount(a ^ b))
    l.join(r, Seq("block", "key")).where(col("id1") < col("id2"))
      .withColumn("hamming", hamming(col("h1"), col("h2")))
      .where(col("hamming") <= maxDist)
      .groupBy("id1", "id2").agg(first("hamming").as("hamming"))
      .select("id1", "id2", "hamming")
  }

  // ---- connected components (pairs -> dedup groups) --------------------

  /**
   * Distributed connected components over a pair table — the step that
   * turns near-duplicate PAIRS into dedup GROUPS (a doc near-dups B,
   * B near-dups C => {A,B,C} is one group even when A-C was never a
   * candidate pair). Alternating large-star / small-star (Kiveris et
   * al., "Connected Components in MapReduce and Beyond", ACM SoCC
   * 2014): converges in O(log^2 n) rounds, each round two hash
   * shuffles on node id with map-side-partial `min` — no driver-side
   * graph state, no vertex ever holds its full neighbor list in memory.
   * Min-label propagation by contrast needs DIAMETER rounds (a chain of
   * 10^6 near-dup docs needs 10^6 rounds there, ~20 here), which is why
   * the star algorithm is the published 10^12-edge shape.
   *
   * Output: one row per distinct id appearing in `pairs`, labeled with
   * the minimum id of its component (`id`, `component`). Ids must be an
   * orderable type. Lineage is cut with an eager localCheckpoint every
   * round so the plan stays O(1) deep across iterations (a cluster
   * deployment would point spark.checkpoint.dir at reliable storage and
   * call checkpoint() — identical shape, resumable).
   */
  def components(pairs: DataFrame, aCol: String, bCol: String, maxIter: Int = 50): DataFrame = {
    val init = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .where(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    // eager + lineage-free like every frame in the loop: checkpoint
    // blocks are reclaimed by the ContextCleaner as the RDDs become
    // unreferenced (no CacheManager entry to unpersist), and the loop's
    // first round scans the same RDD shape as every later round
    val nodes = init.select(col("u").as("id")).union(init.select(col("v").as("id")))
      .distinct().localCheckpoint(true)

    // set signature for the convergence test: (count, hash-xor) — edges
    // are distinct, so xor over per-edge hashes identifies the set; one
    // cheap aggregate per round instead of an except() anti-join
    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    // large-star: for each node, hang all LARGER neighbors off the
    // neighborhood minimum (incl. self). Symmetrize -> per-node min ->
    // re-join; emitted edge count never exceeds the symmetric edge count.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      sym.join(mins, "u").where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")).distinct()
    }

    // small-star: orient each edge large->small; hang all smaller
    // neighbors AND self off the per-node minimum.
    def smallStar(e: DataFrame): DataFrame = {
      val dir = e.select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      val mins = dir.groupBy("u").agg(min("v").as("m")) // all v < u, so min(N+self) = min(N)
      val fromNeighbors = dir.join(mins, "u").select(col("v").as("u"), col("m").as("v"))
      fromNeighbors.union(mins.select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v")).distinct()
    }

    var edges = init
    var sig = signature(edges)
    var it = 0
    var converged = false
    val dbg = sys.env.contains("GRAFT_CC_DEBUG")
    while (it < maxIter && !converged) {
      val t0 = if (dbg) System.nanoTime() else 0L
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      val nsig = signature(next)
      if (edges ne init) edges.unpersist()
      edges = next
      converged = nsig == sig
      sig = nsig
      it += 1
      if (dbg) println(f"[cc] round $it: ${(System.nanoTime() - t0) / 1e9}%.2fs edges=${nsig._1}")
    }
    require(converged, s"components did not converge in $maxIter rounds")
    // fixpoint = star edges (child -> component-min root); roots have no
    // outgoing edge. min() guards the (impossible at fixpoint) multi-edge.
    // Every intermediate (init, nodes, loop frames, result) is a
    // localCheckpoint: no CacheManager entries to unpersist — blocks are
    // reclaimed by the ContextCleaner as the checkpointed RDDs become
    // unreferenced, which happens as soon as this frame returns and the
    // caller drops the result.
    nodes
      .join(edges.select(col("u").as("id"), col("v").as("__c")), Seq("id"), "left")
      .groupBy("id").agg(min(coalesce(col("__c"), col("id"))).as("component"))
      .localCheckpoint(true)
  }

  /** Label every row of `df` with its near-dup component — rows in no
    * pair are their own (singleton) component — plus a canonical flag
    * (the component minimum: the row dedup keeps). */
  def labelComponents(df: DataFrame, idCol: String, pairs: DataFrame,
                      aCol: String = "id1", bCol: String = "id2"): DataFrame = {
    val comp = components(pairs, aCol, bCol)
      .select(col("id").as(idCol), col("component"))
    df.join(comp, Seq(idCol), "left")
      .withColumn("component", coalesce(col("component"), col(idCol)))
      .withColumn("is_canonical", col("component") === col(idCol))
  }

  /** End-to-end text dedup: LSH near-dup pairs -> transitive groups ->
    * canonical flag per row. Filter on `is_canonical` to keep one
    * representative per near-dup cluster. */
  def dedupGroups(df: DataFrame, idCol: String, textCol: String,
                  threshold: Double = 0.8, w: Int = 3): DataFrame =
    labelComponents(df, idCol, nearDuplicates(df, idCol, textCol, threshold, w), "id1", "id2")

  // ---- benchmark decontamination --------------------------------------

  /**
   * Test-set decontamination: flag corpus documents that share word
   * n-grams with a benchmark/eval set (the published GPT-3 appendix-C /
   * PaLM decontamination rule — there 13-grams; `n` is a parameter so
   * small fixtures can exercise the machinery).
   *
   * Grams are built with pure Column algebra (lowercase, whitespace
   * tokens, `transform(sequence(...))` sliding windows, de-duplicated
   * per row with array_distinct) so the identical construction runs in
   * the DuckDB oracle — no UDF, no hash to replicate.
   *
   * 100-TB shape: the benchmark side is tiny by construction (an eval
   * set), so its distinct grams BROADCAST and the corpus-side probe is
   * a map-side LEFT join — corpus gram strings never enter a shuffle.
   * The corpus is read and gram-built ONCE: the per-row gram count rides
   * through explode_outer alongside each gram (zero-gram docs keep their
   * null row), and one hash aggregate on doc id — partially combined
   * map-side, so one row per doc per partition crosses the wire —
   * produces both totals.
   *
   * Output: one row per corpus document — distinct-gram count,
   * contaminated-gram count, e6-scaled contamination fraction, and a
   * `contaminated` flag (any overlap).
   */
  def contamination(corpus: DataFrame, idCol: String, textCol: String,
                    bench: DataFrame, benchTextCol: String, n: Int = 13): DataFrame = {
    require(n >= 1, "gram size must be >= 1")
    // distinct sliding grams in one pass per row (TextAnalysis
    // .slidingGrams — the lambda form was O(tokens²)/row)
    def grams(c: String): Column =
      TextAnalysis.slidingGrams(n, distinct = true)(expr(TextAnalysis.toksExpr(c)))
    val benchGrams = bench
      .select(explode(grams(benchTextCol)).as("__g")).distinct()
      .withColumn("__hit", lit(1L))
    corpus.select(col(idCol), grams(textCol).as("__gs"))
      .select(col(idCol), size(col("__gs")).cast("long").as("__n"),
        explode_outer(col("__gs")).as("__g"))
      .join(broadcast(benchGrams), Seq("__g"), "left")
      .groupBy(idCol)
      .agg(max(col("__n")).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_contaminated"))
      .withColumn("contaminated_frac_e6", expr(
        """CAST(floor(CASE WHEN n_grams = 0 THEN 0.0
          |  ELSE n_contaminated / CAST(n_grams AS DOUBLE) END * 1000000 + 0.5) AS BIGINT)""".stripMargin))
      .withColumn("contaminated", col("n_contaminated") > 0)
  }

  // ---- substring-level exact dedup ------------------------------------

  /**
   * Duplicated-substring spans (Lee et al. 2021, "Deduplicating Training
   * Data Makes Language Models Better"): the published algorithm builds
   * a corpus-wide suffix array and removes every substring of >= N
   * tokens occurring more than once. A suffix array is a single-node
   * construction; the Spark-first re-expression keys on fixed-width
   * k-token grams instead — a token span is duplicated iff every k-gram
   * inside it is globally repeated, so:
   *
   *   1. count every k-gram once across the corpus (one hash aggregate,
   *      map-side combined — the only corpus-sized shuffle, and it
   *      carries (gram-fingerprint, count) partials, not documents);
   *   2. keep grams seen >= minCount times (a small table when
   *      duplication is rare);
   *   3. join each document's gram positions against it and merge
   *      overlapping/adjacent hits into maximal spans with one window
   *      partitioned by document (no global sort).
   *
   * Overlap-or-adjacent hits merge into one span (the removal policy of
   * the reference implementation); a merged span is therefore a union of
   * duplicated k-gram runs, not necessarily one substring that repeats
   * as a unit.
   *
   * Output: one row per maximal duplicated span —
   * (id, span_start [0-based token index], span_tokens, n_grams).
   */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: String,
                     k: Int = 8, minCount: Int = 2,
                     scope: CacheScope = CacheScope.untracked): DataFrame = {
    require(k >= 1, "gram width must be >= 1")
    require(minCount >= 2, "a span is duplicated only from 2 occurrences up")
    // Tokens come from the shared parity snippet (toksExpr, evaluated
    // ONCE per row as the UDF argument); the sliding window itself is a
    // small UDF — the pure-Column transform/slice/array_join form costs
    // seconds of whole-stage-codegen compilation for a per-row loop this
    // trivial, and a lambda re-reference of the tokenizer would be
    // O(tokens²) per document (see TextAnalysis.fencedTokens).
    // Gram strings collapse to 64-bit fingerprints immediately: the
    // count shuffle and the dup probe carry (id, pos, hash) — ~24 B/row
    // instead of the gram text — and the narrow stream persists
    // (memory-and-disk, evictable) so the string construction runs ONE
    // pass instead of once for the counts plus once for the probe. A
    // fingerprint collision (~n²/2⁶⁴) could flag a non-duplicated span —
    // the same trade every published hash-based dedup pass makes.
    val grams = scope.cache(df.select(col(idCol),
        posexplode(TextAnalysis.slidingGrams(k)(expr(TextAnalysis.toksExpr(textCol))))
          .as(Seq("__pos", "__gram")))
      .select(col(idCol), col("__pos"), xxhash64(col("__gram")).as("__g")))
    val dup = grams.groupBy("__g").agg(count(lit(1)).as("__c"))
      .where(col("__c") >= minCount).select("__g")
    val hits = grams.join(dup, "__g").select(col(idCol), col("__pos"))
    val w = Window.partitionBy(idCol).orderBy("__pos")
    val prevEnd = max(col("__pos") + lit(k))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    hits
      .withColumn("__brk",
        when(col("__pos") <= coalesce(prevEnd, lit(-1)), lit(0L)).otherwise(lit(1L)))
      .withColumn("__island", sum(col("__brk")).over(w))
      .groupBy(col(idCol), col("__island"))
      .agg(min(col("__pos")).cast("long").as("span_start"),
        (max(col("__pos")) + lit(k) - min(col("__pos"))).cast("long").as("span_tokens"),
        count(lit(1)).as("n_grams"))
      .select(col(idCol), col("span_start"), col("span_tokens"), col("n_grams"))
  }

  /** Per-document duplication statistics derived from
    * [[duplicateSpans]] — the MassiveText/Gopher document-level rule
    * ("drop documents whose duplicated-content fraction exceeds a
    * threshold") needs exactly this number: tokens covered by
    * duplicated spans over total tokens. One extra aggregate over the
    * span rows; zero-span documents report zero.
    *
    * Output: (id, n_tokens, dup_tokens, dup_frac_e6). */
  def duplicationStats(df: DataFrame, idCol: String, textCol: String,
                       k: Int = 8, minCount: Int = 2): DataFrame = {
    val spans = duplicateSpans(df, idCol, textCol, k, minCount)
      .groupBy(idCol).agg(sum("span_tokens").as("dup_tokens"))
    // greatest(..., 0): size(NULL) is -1 under Spark's default conf —
    // null text reports zero tokens like every sibling operator
    df.select(col(idCol),
        expr(s"CAST(greatest(size(${TextAnalysis.toksExpr(textCol)}), 0) AS BIGINT)")
          .as("n_tokens"))
      .join(spans, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        expr(
          """CAST(floor(CASE WHEN n_tokens = 0 THEN 0.0
            |  ELSE coalesce(dup_tokens, 0) / CAST(n_tokens AS DOUBLE) END
            |  * 1000000 + 0.5) AS BIGINT)""".stripMargin).as("dup_frac_e6"))
  }

  /** Remove every span [[duplicateSpans]] flags from the text (ALL
    * occurrences drop — the conservative policy; keeping one canonical
    * occurrence per duplicate needs a global total order over
    * occurrences, a policy swap on the same plan). Token positions are
    * computed on the lowercased stream the spans were found in, but the
    * surviving tokens keep their original case. */
  def stripSpans(df: DataFrame, idCol: String, textCol: String,
                 k: Int = 8, minCount: Int = 2,
                 outCol: String = "text_deduped"): DataFrame = {
    val spans = duplicateSpans(df, idCol, textCol, k, minCount)
      .groupBy(idCol)
      .agg(collect_list(struct(col("span_start"), col("span_tokens"))).as("__spans"))
    val rawToks = TextAnalysis.toksExpr(textCol, lower = false)
    df.join(spans, Seq(idCol), "left")
      // coalesce to '': null-text rows rebuild as an empty document,
      // the same null-document convention dedupLines uses (the raw
      // array_join over a null token array would return NULL)
      .withColumn(outCol, coalesce(expr(
        s"""array_join(filter($rawToks, (x, i) -> __spans IS NULL OR NOT exists(__spans,
           |  s -> i >= s.span_start AND i < s.span_start + s.span_tokens)), ' ')""".stripMargin),
        lit("")))
      .drop("__spans")
  }

  // ---- embedding near-dup ---------------------------------------------

  /** Cosine near-duplicate pairs over an embedding column, via
    * random-hyperplane LSH bucketing + exact cosine verify (the ANN
    * machinery, reused as a dedup operator). */
  def embeddingPairs(df: DataFrame, idCol: String, embCol: String,
                     minCosine: Double = 0.95, bands: Int = 8, bitsPerBand: Int = 16): DataFrame =
    Ann.cosinePairs(df, idCol, embCol, minCosine, bands, bitsPerBand)
}
