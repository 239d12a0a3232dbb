package graft

import graft.images.SyntheticImages.mix

/**
 * Generators for the DuckDB oracle SQL of queries whose semantics hinge
 * on splitmix64 (graft.images.SyntheticImages.mix) or Java
 * String.hashCode — both fully replicable in ANSI-ish SQL:
 *
 *  - splitmix64 runs over HUGEINT (int128) with explicit 64-bit masking;
 *    the 64x64-bit multiplies are split into 32-bit halves because a
 *    full 64x64 product can overflow int128
 *    ((lo*c mod 2^64) + ((hi*c mod 2^32) << 32) == z*c mod 2^64);
 *  - String.hashCode is a fold of (acc*31 + char) with 32-bit signed
 *    wraparound (same construction as the q_fingerprint oracle).
 *
 * These let the oracle recompute minhash signatures, simhash bit votes,
 * and the deterministic synthetic image/audio payload features
 * independently of any Scala code — a full-semantics check on the REAL
 * corpus rather than a planted toy.
 */
private[graft] object OracleGen {

  private val M = "18446744073709551615" // 2^64 - 1

  /** (a * c) mod 2^64 over non-negative HUGEINTs, 32-bit-split. The
    * shift term is fully parenthesized — SQL's << binds looser than +,
    * so `x + y << 32` would parse as `(x + y) << 32`. */
  private def mul64(a: String, c: String): String =
    s"((((($a) & 4294967295) * $c) & $M) + ((((($a) >> 32) * $c) & 4294967295) << 32))"

  /**
   * Chained CTEs computing m = splitmix64(xExpr) per row of `src`
   * (bit-exact vs SyntheticImages.mix). `keep` columns are carried
   * through; the final CTE is named `name` with the mix in `out`
   * (unsigned, as HUGEINT in [0, 2^64)).
   */
  def mixChain(name: String, src: String, xExpr: String,
               keep: Seq[String], out: String): String = {
    val kc = if (keep.isEmpty) "" else keep.mkString(", ") + ", "
    val m1 = mul64("xor(z0, z0 >> 30)", "13787848793156543929")
    val m2 = mul64("xor(z1, z1 >> 27)", "10723151780598845931")
    s"""${name}_m0 AS (SELECT $kc(((CAST(($xExpr) AS HUGEINT) & $M) + 11400714819323198485) & $M) AS z0 FROM $src),
       |${name}_m1 AS (SELECT $kc(($m1) & $M) AS z1 FROM ${name}_m0),
       |${name}_m2 AS (SELECT $kc(($m2) & $M) AS z2 FROM ${name}_m1),
       |$name AS (SELECT ${kc}xor(z2, z2 >> 31) AS $out FROM ${name}_m2)""".stripMargin
  }

  /** Unsigned-HUGEINT value in [0,2^64) -> the signed BIGINT with the
    * same 64-bit pattern (Scala Long semantics for MIN/compare). */
  def toSigned(u: String): String =
    s"CASE WHEN $u >= 9223372036854775808 THEN CAST($u - 18446744073709551616 AS BIGINT) ELSE CAST($u AS BIGINT) END"

  /** Java String.hashCode as SQL (ASCII corpus; 32-bit signed wrap per
    * step, result sign-extended to BIGINT). */
  def jhash(strExpr: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(string_split($strExpr, ''), c -> CAST(ascii(c) AS BIGINT))),
       |  (acc, c) -> CASE WHEN ((acc*31+c) & 4294967295) >= 2147483648
       |    THEN ((acc*31+c) & 4294967295) - 4294967296
       |    ELSE ((acc*31+c) & 4294967295) END)""".stripMargin.replace("\n", " ")

  /** Tokens exactly like Dedup: text.toLowerCase.split("\\s+") minus
    * empties. */
  private val TokCte =
    """tok AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS tk FROM documents)"""

  // ---- q_simhash_pairs -------------------------------------------------

  /** Full SimHash replication: per-token mix(hashCode), 64 bit votes,
    * then brute-force Hamming pairs (the pigeonhole machinery on the
    * Spark side is exact for <= maxDist, so the sets must coincide). */
  def simhashPairsSql(maxDist: Int): String = {
    val bits = (0 until 64).map { b =>
      s"(CASE WHEN SUM(CASE WHEN ((m >> $b) & 1) = 1 THEN 1 ELSE -1 END) > 0 THEN (CAST(1 AS HUGEINT) << $b) ELSE CAST(0 AS HUGEINT) END)"
    }.mkString(" + ")
    s"""WITH $TokCte,
       |tr AS (SELECT doc_id, unnest(tk) AS t FROM tok),
       |jh AS (SELECT doc_id, ${jhash("t")} AS x FROM tr),
       |${mixChain("mx", "jh", "x", Seq("doc_id"), "m")},
       |sh AS (SELECT doc_id, ($bits) AS u FROM mx GROUP BY doc_id),
       |allsh AS (SELECT d.doc_id, COALESCE(${toSigned("sh.u")}, 0) AS h
       |  FROM documents d LEFT JOIN sh ON d.doc_id = sh.doc_id)
       |SELECT a.doc_id AS id1, b.doc_id AS id2,
       |  CAST(bit_count(xor(a.h, b.h)) AS INT) AS hamming
       |FROM allsh a JOIN allsh b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.h, b.h)) <= $maxDist""".stripMargin
  }

  // ---- q_dedup_minhash -------------------------------------------------

  /**
   * Full MinHash-LSH replication: 3-word shingles -> 64-slot signature
   * (min over mix(shingle ^ seed_j)) -> candidate = some 4-slot band
   * equal -> est_jaccard = equal-slot fraction >= threshold. Murmur3
   * bucket-hash collisions on the Spark side can only ADD candidates
   * that the same est filter then re-checks, so the outputs coincide
   * (a 4-long murmur collision between unequal slices is the only
   * divergence and is astronomically unlikely + deterministic).
   */
  def minhashPairsSql(threshold: Double): String = {
    val mask = (BigInt(1) << 64) - 1
    val seeds = (0 until 64)
      .map(j => BigInt(mix(j.toLong * 0x9e3779b97f4a7c15L)) & mask)
    val seedRows = seeds.zipWithIndex
      .map { case (s, j) => s"($j, CAST('$s' AS HUGEINT))" }.mkString(", ")
    val bandEq = "list_contains(list_transform(generate_series(0, 15), bb -> " +
      "a.sig[4*bb+1] = b.sig[4*bb+1] AND a.sig[4*bb+2] = b.sig[4*bb+2] AND " +
      "a.sig[4*bb+3] = b.sig[4*bb+3] AND a.sig[4*bb+4] = b.sig[4*bb+4]), true)"
    s"""WITH $TokCte,
       |shl AS (SELECT doc_id, CASE WHEN len(tk) < 3
       |    THEN [${jhash("array_to_string(tk, ' ')")}]
       |    ELSE [${jhash("tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]")} * 31 + 3
       |          for i in generate_series(1, len(tk) - 2)]
       |  END AS sh FROM tok),
       |shr AS (SELECT doc_id, unnest(sh) AS x FROM shl),
       |${mixChain("msh", "shr", "x", Seq("doc_id"), "shu")},
       |seeds AS (SELECT * FROM (VALUES $seedRows) AS t(j, s)),
       |sx AS (SELECT doc_id, j, xor(shu, s) AS u FROM msh CROSS JOIN seeds),
       |${mixChain("mm", "sx", "u", Seq("doc_id", "j"), "m")},
       |mn AS (SELECT doc_id, j, MIN(${toSigned("m")}) AS v FROM mm GROUP BY doc_id, j),
       |sig AS (SELECT doc_id, list(v ORDER BY j) AS sig FROM mn GROUP BY doc_id)
       |SELECT id1, id2, round(est, 6) AS est_jaccard FROM (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2,
       |    CAST(len(list_filter(generate_series(1, 64), i -> a.sig[i] = b.sig[i])) AS DOUBLE) / 64.0 AS est,
       |    $bandEq AS cand
       |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id) z
       |WHERE cand AND est >= $threshold""".stripMargin
  }

  // ---- q_audio_features ------------------------------------------------

  /** Synthetic WAV feature replication: the PCM16 payload is lossless,
    * so the decoded samples equal the closed-form synthesis
    * (SyntheticMedia.wav) recomputed here sample-by-sample. */
  def audioFeaturesSql(maxDocId: Int): String = {
    s"""WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < $maxDocId),
       |${mixChain("fq", "ids", "id", Seq("id"), "mf")},
       |${mixChain("am", "ids", "id + 1", Seq("id"), "ma")},
       |par AS (SELECT fq.id,
       |    200.0 + CAST(mf & 1023 AS DOUBLE) AS freq,
       |    0.3 + (CAST(ma & 255 AS DOUBLE) / 255.0) * 0.5 AS amp
       |  FROM fq JOIN am ON fq.id = am.id),
       |si AS (SELECT id, freq, amp, unnest(generate_series(0, 3999)) AS i FROM par),
       |${mixChain("nz", "si", "id * 1000003 + i", Seq("id", "freq", "amp", "i"), "mn")},
       |smp AS (SELECT id, i,
       |    CAST(trunc(GREATEST(-1.0, LEAST(1.0,
       |      amp * sin(2 * pi() * freq * (CAST(i AS DOUBLE) / 8000.0))
       |      + (CAST(mn >> 40 AS DOUBLE) / 16777216.0 - 0.5) * 0.02)) * 32767.0) AS BIGINT) AS s16
       |  FROM nz),
       |rm AS (SELECT id,
       |    sqrt(SUM((CAST(s16 AS DOUBLE) / 32768.0) * (CAST(s16 AS DOUBLE) / 32768.0)) / 4000.0) AS rms
       |  FROM smp GROUP BY id),
       |zc AS (SELECT id, COUNT(*) FILTER (WHERE prev IS NOT NULL AND sg <> prev) AS zc
       |  FROM (SELECT id, sg, LAG(sg) OVER (PARTITION BY id ORDER BY i) AS prev
       |        FROM (SELECT id, i, CASE WHEN s16 > 0 THEN 1 ELSE -1 END AS sg
       |              FROM smp WHERE s16 <> 0) q1) q2
       |  GROUP BY id)
       |SELECT CAST(rm.id AS VARCHAR) AS audio_id,
       |  CAST(8000 AS INT) AS sample_rate, CAST(4000 AS BIGINT) AS n_samples,
       |  round(rm.rms, 4) AS rms,
       |  CAST(COALESCE(zc.zc, 0) AS BIGINT) AS zero_crossings,
       |  CAST(TRUE AS BOOLEAN) AS decode_ok
       |FROM rm LEFT JOIN zc ON rm.id = zc.id""".stripMargin
  }

  // ---- q_image_features ------------------------------------------------

  /** Synthetic-PNG feature replication: PNG decode is lossless, so the
    * decoded pixels equal the closed-form render pattern
    * (SyntheticImages.render) recomputed per pixel. JPEG rows are
    * excluded on both sides (lossy; covered by the PSNR>=40dB specs). */
  /** Oracle for q_clean_images: fates derive from the splitmix-closed-form
    * image dims (decode_fail for the planted corrupt ids, extreme_aspect
    * from the size formulas, phash_dup for the byte-identical suffixed
    * duplicates, kept otherwise). Rests on the spec-asserted precondition
    * that distinct renders in the id range have distinct decode-phashes
    * (MultimodalSpec "precondition"), so phash groups == duplicate-id
    * groups. */
  def cleanImagesSql(nImages: Int, maxAspect: Double): String = {
    def dims(m: String) =
      s"CASE CAST(($m & 2147483647) AS BIGINT) % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 256 END"
    s"""WITH i0 AS (SELECT unnest(generate_series(0, ${nImages - 1})) AS id),
       |${mixChain("mw", "i0", "id * 3 + 1", Seq("id"), "m")},
       |${mixChain("mh", "i0", "id * 3 + 2", Seq("id"), "m")},
       |geom AS (SELECT mw.id, ${dims("mw.m")} AS w, ${dims("mh.m")} AS h
       |  FROM mw JOIN mh ON mw.id = mh.id),
       |rows0 AS (
       |  SELECT printf('img%09d', CAST(id AS INT)) AS image_id, w, h, FALSE AS is_dup FROM geom
       |  UNION ALL
       |  SELECT printf('img%09d', CAST(id AS INT)) || 'x', w, h, TRUE FROM geom WHERE id % 5 = 0)
       |SELECT image_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       |  CASE WHEN CAST(greatest(w, h) AS DOUBLE) / least(w, h) > $maxAspect THEN 'extreme_aspect'
       |       WHEN is_dup THEN 'phash_dup' ELSE 'kept' END AS fate
       |FROM rows0
       |UNION ALL SELECT 'imgBAD001', -1, -1, 'decode_fail'
       |UNION ALL SELECT 'imgBAD002', -1, -1, 'decode_fail'""".stripMargin
  }

  def imageFeaturesSql(nImages: Int): String = {
    def dims(m: String) =
      s"CASE CAST(($m & 2147483647) AS BIGINT) % 3 WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 256 END"
    s"""WITH i0 AS (SELECT unnest(generate_series(0, ${nImages - 1})) AS id),
       |${mixChain("mf", "i0", "id * 3 + 3", Seq("id"), "m")},
       |png AS (SELECT id FROM mf WHERE (m & 1) = 0),
       |${mixChain("mw", "png", "id * 3 + 1", Seq("id"), "m")},
       |${mixChain("mh", "png", "id * 3 + 2", Seq("id"), "m")},
       |${mixChain("p1", "png", "id + 11", Seq("id"), "m")},
       |${mixChain("p2", "png", "id + 22", Seq("id"), "m")},
       |${mixChain("p3", "png", "id + 33", Seq("id"), "m")},
       |geom AS (SELECT mw.id, ${dims("mw.m")} AS w, ${dims("mh.m")} AS h,
       |    CAST(p1.m & 65535 AS DOUBLE) / 65536.0 * 2 * pi() AS ph1,
       |    CAST(p2.m & 65535 AS DOUBLE) / 65536.0 * 2 * pi() AS ph2,
       |    CAST(p3.m & 65535 AS DOUBLE) / 65536.0 * 2 * pi() AS ph3
       |  FROM mw JOIN mh ON mw.id = mh.id JOIN p1 ON mw.id = p1.id
       |    JOIN p2 ON mw.id = p2.id JOIN p3 ON mw.id = p3.id),
       |px AS (SELECT id, w, h, ph1, ph2, ph3, unnest(generate_series(0, w*h - 1)) AS k FROM geom),
       |lum AS (SELECT id, w, h,
       |    SUM(0.299 * floor(127.5 * (1 + sin(2 * pi() * (k % w) / w + ph1)))
       |      + 0.587 * floor(127.5 * (1 + sin(2 * pi() * (k // w) / h + ph2)))
       |      + 0.114 * floor(127.5 * (1 + sin(pi() * ((k % w) + (k // w)) / (w + h) + ph3)))) AS lsum
       |  FROM px GROUP BY id, w, h)
       |SELECT printf('img%09d', id) AS image_id, CAST(w AS INT) AS width,
       |  CAST(h AS INT) AS height,
       |  CAST(floor(lsum / CAST(w*h AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS luma_e4,
       |  CAST(TRUE AS BOOLEAN) AS decode_ok
       |FROM lum""".stripMargin
  }
}
