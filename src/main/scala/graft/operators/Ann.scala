package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.images.SyntheticImages.mix

/**
 * Approximate nearest-neighbor search over an embedding column
 * (Array[Float]). Two paths:
 *
 *  - bruteForceTopK: exact cosine top-k against a (small) query set —
 *    the correctness baseline; scales as |data| x |queries| with the
 *    queries broadcast, fine when queries fit an executor.
 *  - LSH (random hyperplane / sign hashing): deterministic seeded
 *    hyperplanes -> sign-bit signature -> banded buckets -> candidates
 *    share a band -> exact cosine refine. The scale path: shuffles on
 *    bucket keys only, never the cross product.
 */
object Ann {

  /** Deterministic pseudo-Gaussian hyperplane component (seeded; the
    * sum of 4 uniforms approximates a normal well enough for sign LSH). */
  private def gauss(seed: Long): Double = {
    var s = 0.0
    var i = 0L
    while (i < 4) {
      s += ((mix(seed * 4 + i) >>> 11).toDouble / (1L << 53).toDouble) - 0.5
      i += 1
    }
    s
  }

  // hyperplane matrix cache: deterministic per (bits, dim), computed once
  // per JVM instead of per row (the gauss() mixing is 4 hash rounds per
  // component — 4k calls per row without the cache)
  private val planes = new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()
  private def hyperplanes(bits: Int, dim: Int): Array[Array[Double]] =
    planes.computeIfAbsent((bits, dim), { _ =>
      Array.tabulate(bits, dim)((b, i) => gauss(b.toLong * 100003 + i))
    })

  /** bits-wide sign signature of a vector under seeded hyperplanes.
    * NOTE every kernel here converts the incoming Seq to an Array first:
    * Spark hands UDFs an immutable List for ArrayType columns, and
    * indexed access on List is O(i) — an O(dim^2) trap that turned a
    * 15 ms banding pass into seconds. */
  private def signature(vs: Seq[Float], bits: Int): Long = {
    val v = vs.toArray
    val h = hyperplanes(bits, v.length)
    var sig = 0L
    var b = 0
    while (b < bits) {
      val row = h(b)
      var dot = 0.0
      var i = 0
      while (i < v.length) {
        dot += v(i) * row(i)
        i += 1
      }
      if (dot >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Per-band sign keys: `bands` independent keys of `bitsPerBand` sign
    * bits each (bands x bitsPerBand hyperplanes total — NOT limited to
    * 64 bits overall, unlike the packed signature). Wide band keys are
    * what keeps LSH sub-quadratic at scale: 16-bit keys give 65k buckets
    * per band, vs the 16 buckets a 4-bit slice of a 16-bit signature
    * yields (where every bucket goes quadratic on big data). */
  /** `offsets(p)` = hyperplane p dot the dataset mean — sign tests run
    * on the MEAN-CENTERED vector (dot(v, row) - offset >= 0). Embedding
    * spaces are routinely biased (e.g. all-positive activations push
    * every pairwise cosine toward ~0.75), which makes raw sign bits
    * nearly constant and every bucket quadratic; centering rebalances
    * the bits so only genuinely close pairs collide. */
  private def bandKeys(vs: Seq[Float], bands: Int, bitsPerBand: Int,
                       offsets: Array[Double]): Array[Long] = {
    val v = vs.toArray
    val h = hyperplanes(bands * bitsPerBand, v.length)
    Array.tabulate(bands) { b =>
      var key = 0L
      var i = 0
      while (i < bitsPerBand) {
        val p = b * bitsPerBand + i
        val row = h(p)
        var dot = 0.0
        var j = 0
        while (j < v.length) { dot += v(j) * row(j); j += 1 }
        if (dot - offsets(p) >= 0) key |= (1L << i)
        i += 1
      }
      key
    }
  }

  /** One-pass per-dimension mean of the embedding column (driver gets a
    * dim-sized array — bounded, like the IVF centroid sample). */
  private def meanVector(df: DataFrame, embCol: String): Array[Double] = {
    // null / empty / dimension-mismatched rows are skipped (they carry no
    // usable signal for the mean; the banding UDF handles them per row),
    // so one bad row cannot fail the whole lshTopK/cosinePairs job here
    val rdd = df.select(col(embCol)).rdd
      .map(r => if (r.isNullAt(0)) null else r.getSeq[Float](0))
    val (sum, n) = rdd.treeAggregate((null: Array[Double], 0L))(
      seqOp = { case ((acc, c), v) =>
        if (v == null || v.isEmpty || (acc != null && v.length != acc.length)) (acc, c)
        else {
          val a = if (acc == null) new Array[Double](v.length) else acc
          var i = 0
          while (i < v.length) { a(i) += v(i); i += 1 }
          (a, c + 1)
        }
      },
      combOp = { case ((a, ca), (b, cb)) =>
        if (a == null) (b, cb)
        else if (b == null) (a, ca)
        else if (a.length != b.length) { if (ca >= cb) (a, ca) else (b, cb) }
        else {
          var i = 0
          while (i < a.length) { a(i) += b(i); i += 1 }
          (a, ca + cb)
        }
      })
    if (sum == null || n == 0) Array.empty
    else sum.map(_ / n)
  }

  /** Hyperplane-dot-mean offsets for the centered sign test. */
  private def planeOffsets(mean: Array[Double], bands: Int, bitsPerBand: Int): Array[Double] = {
    if (mean.isEmpty) return new Array[Double](bands * bitsPerBand)
    val h = hyperplanes(bands * bitsPerBand, mean.length)
    Array.tabulate(bands * bitsPerBand) { p =>
      var dot = 0.0
      var j = 0
      while (j < mean.length) { dot += mean(j) * h(p)(j); j += 1 }
      dot
    }
  }

  // null or length-mismatched operands score 0.0 (rank last / below any
  // similarity threshold) instead of failing the whole job on one
  // malformed row
  private val cosineUdf = udf { (as: Seq[Float], bs: Seq[Float]) =>
    if (as == null || bs == null || as.length != bs.length) 0.0
    else {
      val a = as.toArray; val b = bs.toArray
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  /** Exact top-k by cosine for each query vector (queries broadcast). */
  def bruteForceTopK(data: DataFrame, idCol: String, embCol: String,
                     queries: DataFrame, qidCol: String, qEmbCol: String,
                     k: Int): DataFrame = {
    data.crossJoin(broadcast(queries))
      .withColumn("cosine", cosineUdf(col(embCol), col(qEmbCol)))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(qidCol).orderBy(desc("cosine"), col(idCol))))
      .where(col("__rn") <= k)
      .select(col(qidCol), col(idCol), col("cosine"))
  }

  /** LSH-bucketed top-k: recall < 1 by construction; `bands` independent
    * band keys of `bitsPerBand` sign bits each — candidates share at
    * least one exact band key.
    *
    * Precondition: `idCol`/`qidCol` uniquely identify rows — the banding
    * carries ids only and re-joins the embeddings per unique id, so a
    * duplicated id fans out into duplicate candidate rows. */
  def lshTopK(data: DataFrame, idCol: String, embCol: String,
              queries: DataFrame, qidCol: String, qEmbCol: String,
              k: Int, bands: Int = 8, bitsPerBand: Int = 16): DataFrame = {
    val offsets = planeOffsets(meanVector(data, embCol), bands, bitsPerBand)
    val keysU = udf((v: Seq[Float]) => bandKeys(v, bands, bitsPerBand, offsets))
    def banded(df: DataFrame, id: String, emb: String) =
      df.select(col(id), col(emb), posexplode(keysU(col(emb))).as(Seq("band", "key")))
    // banding carries ids only; embeddings re-join once per UNIQUE
    // (query, candidate) pair and the cosine is computed once per pair
    // (not once per colliding band)
    val d = banded(data, idCol, embCol).select(col("band"), col("key"), col(idCol))
    val q = banded(queries, qidCol, qEmbCol).select(col("band"), col("key"), col(qidCol))
    d.join(broadcast(q), Seq("band", "key"))
      .groupBy(qidCol, idCol).agg(count(lit(1)).as("__nb")).drop("__nb")
      .join(data.select(col(idCol), col(embCol)), idCol)
      .join(broadcast(queries.select(col(qidCol), col(qEmbCol))), qidCol)
      .withColumn("cosine", cosineUdf(col(embCol), col(qEmbCol)))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(qidCol).orderBy(desc("cosine"), col(idCol))))
      .where(col("__rn") <= k)
      .select(col(qidCol), col(idCol), col("cosine"))
  }

  /**
   * IVF (inverted-file) top-k: a coarse quantizer of `nLists` centroids
   * (deterministic sample of the data, one refinement sweep) partitions
   * vectors into lists; each query probes its `nProbe` nearest lists and
   * ranks exact cosine inside them. The classic ANN scale path: the
   * data side shuffles once on the list id and each query touches
   * nProbe/nLists of the data.
   */
  /** Coarse-quantizer centroids: explicit (a pre-trained quantizer, as
    * FAISS-style IVF APIs accept — see [[kmeans]]) or every
    * (n/nLists)-th row by id hash — deterministic and cheap. */
  private def quantizer(data: DataFrame, idCol: String, embCol: String,
                        nLists: Int,
                        centroids: Option[Array[Seq[Float]]]): Array[(Int, Seq[Float])] = {
    val cents: Array[(Int, Seq[Float])] = centroids match {
      case Some(cs) => cs.zipWithIndex.map { case (c, i) => (i, c) }
      case None =>
        // a null/empty embedding in the sample window would become a
        // null centroid and crash every assignment
        val valid = data.where(col(embCol).isNotNull && size(col(embCol)) > 0)
        val sampled = valid
          .withColumn("__h", pmod(xxhash64(col(idCol)), lit(1000)))
          .where(col("__h") < lit(math.max(1, 1000 / nLists)))
          .select(col(idCol), col(embCol))
          .orderBy(col(idCol)) // limit without order is nondeterministic
          .limit(nLists)
          .select(col(embCol))
          .collect()
        // hash-window shortfall (tiny or unluckily-hashed corpora):
        // top up from the full table so callers get the k they asked
        // for whenever k valid rows exist
        val rows =
          if (sampled.length >= nLists) sampled
          else valid.select(col(embCol)).orderBy(col(idCol)).limit(nLists).collect()
        rows.zipWithIndex.map { case (r, i) => (i, r.getSeq[Float](0)) }
    }
    require(cents.nonEmpty, "no centroids sampled")
    cents
  }

  def ivfTopK(data: DataFrame, idCol: String, embCol: String,
              queries: DataFrame, qidCol: String, qEmbCol: String,
              k: Int, nLists: Int = 16, nProbe: Int = 4,
              centroids: Option[Array[Seq[Float]]] = None): DataFrame = {
    val cents = quantizer(data, idCol, embCol, nLists, centroids)
    val bc = cents
    def nearestLists(v: Seq[Float], n: Int): Seq[Int] =
      bc.map { case (i, c) => (i, cosineVal(v, c)) }.sortBy(-_._2).take(n).map(_._1).toSeq
    val assign = udf((v: Seq[Float]) => nearestLists(v, 1).head)
    val probe = udf((v: Seq[Float]) => nearestLists(v, nProbe))
    val d = data.withColumn("__list", assign(col(embCol)))
    val q = queries.withColumn("__list", explode(probe(col(qEmbCol))))
    d.join(broadcast(q), "__list")
      .withColumn("cosine", cosineUdf(col(embCol), col(qEmbCol)))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(qidCol).orderBy(desc("cosine"), col(idCol))))
      .where(col("__rn") <= k)
      .select(col(qidCol), col(idCol), col("cosine"))
  }

  /**
   * Distributed Lloyd k-means over the embedding column — the quantizer
   * trainer the IVF/SemDeDup paths accept through their `centroids`
   * parameter. Each iteration: centroids broadcast in the assignment
   * closure, per-row nearest-centroid assignment (squared Euclidean),
   * per-(cluster, dimension) sums via ONE hash aggregate
   * (posexplode → groupBy, map-side combined — k×dim rows cross the
   * wire, never vectors), means rebuilt on the driver (k×dim doubles,
   * bounded). Init = explicit centroids or the deterministic id-hash
   * sample [[ivfTopK]] uses. Empty clusters keep their previous
   * centroid. Null/mis-sized vectors are ignored for training and
   * assign to cluster -1.
   *
   * Returns (final centroids, assignment DataFrame (idCol, cluster)).
   */
  def kmeans(df: DataFrame, idCol: String, embCol: String,
             k: Int, iters: Int = 5,
             init: Option[Array[Seq[Float]]] = None,
             scope: CacheScope = CacheScope.untracked): (Array[Array[Double]], DataFrame) = {
    require(k >= 1 && iters >= 1, "k and iters must be >= 1")
    init.foreach(cs => require(cs.length == k,
      s"init supplies ${cs.length} centroids but k = $k"))
    // the Lloyd loop re-reads the input iters+1 times — materialize the
    // narrow (id, emb) projection once instead of re-running whatever
    // pipeline produced it (memory-and-disk, evictable; the caller's
    // scope owns release — the returned assignment plan reads it too)
    val data = scope.cache(df.select(col(idCol), col(embCol)))
    var cents: Array[Array[Double]] =
      quantizer(data, idCol, embCol, k, init).map(_._2.toArray.map(_.toDouble))
    def assignUdf(cs: Array[Array[Double]]) = udf { (vs: Seq[Float]) =>
      if (vs == null || vs.isEmpty) -1
      else {
        val v = vs.toArray
        var best = -1
        var bestD = Double.MaxValue
        var c = 0
        while (c < cs.length) {
          val ct = cs(c)
          if (ct.length == v.length) {
            var d = 0.0
            var i = 0
            while (i < v.length) { val t = v(i) - ct(i); d += t * t; i += 1 }
            if (d < bestD) { bestD = d; best = c }
          }
          c += 1
        }
        best
      }
    }
    var it = 0
    while (it < iters) {
      val sums = data
        .select(assignUdf(cents)(col(embCol)).as("__c"),
          posexplode(col(embCol)).as(Seq("__d", "__x")))
        .where(col("__c") >= 0)
        .groupBy("__c", "__d")
        .agg(sum(col("__x").cast("double")).as("__s"), count(lit(1)).as("__n"))
        .collect()
      val next = cents.map(_.clone())
      sums.foreach { r =>
        val c = r.getInt(0); val d = r.getInt(1)
        if (d < next(c).length) next(c)(d) = r.getDouble(2) / r.getLong(3)
      }
      cents = next
      it += 1
    }
    val assigned = data.withColumn("cluster", assignUdf(cents)(col(embCol)))
      .select(col(idCol), col("cluster"))
    (cents, assigned)
  }

  /**
   * SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
   * embeddings with a coarse quantizer (explicit centroids, e.g. from
   * [[kmeans]], or the deterministic sample), compare pairs INSIDE each
   * cluster only, and drop every item that has a lower-id neighbor with
   * cosine >= tau — the deterministic min-id survivor rule: one
   * representative per near-duplicate CHAIN survives (a dropped item's
   * own neighbors still count as covered, exactly like SemDeDup's
   * per-cluster pruning; its keep-farthest-from-centroid tie-break is a
   * policy swap on the same plan).
   *
   * 100-TB shape: one shuffle on the cluster id; candidate pairs form
   * within clusters only (~n/nLists each) and carry ids alone — the
   * embeddings re-join once per pair for the exact cosine; clusters
   * over `maxCluster` rows are dropped like oversized LSH buckets
   * (quadratic guard) instead of silently going O(n²).
   *
   * Precondition: `idCol` uniquely identifies rows.
   * Output: (idCol, cluster, keep, cluster_capped) — `cluster_capped`
   * is true when the row's cluster exceeded `maxCluster` and was
   * therefore EXCLUDED from pairwise pruning (every such row keeps):
   * the quadratic guard is visible per row instead of silently eating
   * near-duplicates, so a caller (or an oracle) can audit exactly which
   * rows went un-judged.
   */
  def semanticDedup(df: DataFrame, idCol: String, embCol: String,
                    tau: Double, nLists: Int = 16,
                    centroids: Option[Array[Seq[Float]]] = None,
                    maxCluster: Int = 1 << 16,
                    scope: CacheScope = CacheScope.untracked): DataFrame = {
    val cents = quantizer(df, idCol, embCol, nLists, centroids)
    val bc = cents
    // null/empty/mis-sized vectors assign to cluster -1 (excluded from
    // pairing below — they can't be judged, so they keep)
    val assign = udf { (v: Seq[Float]) =>
      if (v == null || v.isEmpty) -1
      else {
        val fit = bc.filter(_._2.length == v.length)
        if (fit.isEmpty) -1
        else fit.map { case (i, c) => (i, cosineVal(v, c)) }
          .maxBy { case (i, cos) => (cos, -i) }._1
      }
    }
    // the assignment (all-centroid cosines per row) feeds the bucket
    // count, the pair scans, and both embedding re-joins — materialize
    // it once (memory-and-disk, evictable; the minhashPairs idiom)
    val a = scope.cache(df.select(col(idCol).as("__id"), col(embCol).as("__emb"))
      .withColumn("cluster", assign(col("__emb"))))
    // ONE cluster-size aggregate serves both the quadratic-guard filter
    // and the per-row cluster_capped audit flag (the capBuckets count,
    // inlined so it isn't computed twice)
    val members = a.where(col("cluster") >= 0).select("cluster", "__id")
    val sizes = members.groupBy("cluster").agg(count(lit(1)).as("__csize"))
    val ids =
      if (maxCluster <= 0) members
      else members.join(
        sizes.where(col("__csize") <= maxCluster).drop("__csize"), "cluster")
    val l = ids.select(col("cluster"), col("__id").as("__id1"))
    val r = ids.select(col("cluster"), col("__id").as("__id2"))
    val dropped = l.join(r, Seq("cluster")).where(col("__id1") < col("__id2"))
      .select("__id1", "__id2")
      .join(a.select(col("__id").as("__id1"), col("__emb").as("__e1")), "__id1")
      .join(a.select(col("__id").as("__id2"), col("__emb").as("__e2")), "__id2")
      .where(cosineUdf(col("__e1"), col("__e2")) >= tau)
      .select(col("__id2").as("__id")).distinct()
      .withColumn("__dropped", lit(true))
    val capped =
      if (maxCluster <= 0) sizes.where(lit(false)).select(col("cluster"))
      else sizes.where(col("__csize") > maxCluster).select(col("cluster"))
    a.select(col("__id"), col("cluster"))
      .join(dropped, Seq("__id"), "left")
      .join(capped.withColumn("__capped", lit(true)), Seq("cluster"), "left")
      .select(col("__id").as(idCol), col("cluster"),
        col("__dropped").isNull.as("keep"),
        coalesce(col("__capped"), lit(false)).as("cluster_capped"))
  }

  private def cosineVal(as: Seq[Float], bs: Seq[Float]): Double = {
    if (as == null || bs == null || as.length != bs.length) return 0.0
    val a = as.toArray; val b = bs.toArray
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** All pairs with cosine >= minCosine via banded sign-LSH + verify —
    * used for embedding-level near-dup detection. Scale shape: banding
    * carries (band, key, id) only (~16 bytes/row through the bucket
    * shuffle — embeddings never ride the explode), candidate pairs dedup
    * on ids, then embeddings re-join once per UNIQUE pair and the cosine
    * is computed once per pair. Buckets over `maxBucket` rows are
    * dropped (quadratic guard — see Dedup.capBuckets).
    *
    * Precondition: `idCol` uniquely identifies rows (the id-only re-join
    * fans out duplicated ids into duplicate pair rows). */
  def cosinePairs(df: DataFrame, idCol: String, embCol: String,
                  minCosine: Double, bands: Int = 8, bitsPerBand: Int = 16,
                  maxBucket: Int = 4096): DataFrame = {
    val offsets = planeOffsets(meanVector(df, embCol), bands, bitsPerBand)
    val keysU = udf((v: Seq[Float]) => bandKeys(v, bands, bitsPerBand, offsets))
    val banded = Dedup.capBuckets(
      df.select(col(idCol).as("id"),
          posexplode(keysU(col(embCol))).as(Seq("band", "key")))
        .select("id", "band", "key"),
      Seq("band", "key"), maxBucket)
    val l = banded.select(col("band"), col("key"), col("id").as("id1"))
    val r = banded.select(col("band"), col("key"), col("id").as("id2"))
    val pairs = l.join(r, Seq("band", "key")).where(col("id1") < col("id2"))
      .select("id1", "id2").groupBy("id1", "id2").agg(count(lit(1)).as("__nb"))
      .drop("__nb")
    pairs
      .join(df.select(col(idCol).as("id1"), col(embCol).as("emb1")), "id1")
      .join(df.select(col(idCol).as("id2"), col(embCol).as("emb2")), "id2")
      .withColumn("cosine", cosineUdf(col("emb1"), col("emb2")))
      .where(col("cosine") >= minCosine)
      .select("id1", "id2", "cosine")
  }
}
