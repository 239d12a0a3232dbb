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

  private val cosineUdf = udf { (as: Seq[Float], bs: Seq[Float]) =>
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
  def ivfTopK(data: DataFrame, idCol: String, embCol: String,
              queries: DataFrame, qidCol: String, qEmbCol: String,
              k: Int, nLists: Int = 16, nProbe: Int = 4,
              centroids: Option[Array[Seq[Float]]] = None): DataFrame = {
    // centroids: explicit (a pre-trained quantizer, as FAISS-style IVF
    // APIs accept) or every (n/nLists)-th row by id hash — deterministic
    // and cheap; a k-means refinement would slot in here identically
    val cents: Array[(Int, Seq[Float])] = centroids match {
      case Some(cs) => cs.zipWithIndex.map { case (c, i) => (i, c) }
      case None => data
        .withColumn("__h", pmod(xxhash64(col(idCol)), lit(1000)))
        .where(col("__h") < lit(math.max(1, 1000 / nLists)))
        .select(col(idCol), col(embCol))
        .orderBy(col(idCol)) // limit without order is nondeterministic
        .limit(nLists)
        .select(col(embCol))
        .collect().zipWithIndex.map { case (r, i) => (i, r.getSeq[Float](0)) }
    }
    require(cents.nonEmpty, "no centroids sampled")
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

  private def cosineVal(as: Seq[Float], bs: Seq[Float]): Double = {
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
