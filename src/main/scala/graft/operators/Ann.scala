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

  /** bits-wide sign signature of a vector under seeded hyperplanes. */
  private def signature(v: Seq[Float], bits: Int): Long = {
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

  private val cosineUdf = udf { (a: Seq[Float], b: Seq[Float]) =>
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

  /** LSH-bucketed top-k: recall < 1 by construction; `bands` bands of
    * `bits/bands` sign bits each — candidates share at least one band. */
  def lshTopK(data: DataFrame, idCol: String, embCol: String,
              queries: DataFrame, qidCol: String, qEmbCol: String,
              k: Int, bits: Int = 16, bands: Int = 4): DataFrame = {
    require(bits % bands == 0)
    val width = bits / bands
    val sigU = udf((v: Seq[Float]) => signature(v, bits))
    val bandKey = udf((sig: Long, b: Int) => (sig >>> (b * width)) & ((1L << width) - 1))
    def banded(df: DataFrame, id: String, emb: String) =
      df.withColumn("__sig", sigU(col(emb)))
        .withColumn("band", explode(sequence(lit(0), lit(bands - 1))))
        .withColumn("key", bandKey(col("__sig"), col("band")))
    val d = banded(data, idCol, embCol).select(col("band"), col("key"), col(idCol), col(embCol))
    val q = banded(queries, qidCol, qEmbCol).select(col("band"), col("key"), col(qidCol), col(qEmbCol))
    // cosine before the (qid, id) dedup: the shuffle carries a scalar,
    // not two embedding vectors
    d.join(broadcast(q), Seq("band", "key"))
      .withColumn("cosine", cosineUdf(col(embCol), col(qEmbCol)))
      .groupBy(qidCol, idCol).agg(first(col("cosine")).as("cosine"))
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
              k: Int, nLists: Int = 16, nProbe: Int = 4): DataFrame = {
    // centroids: every (n/nLists)-th row by id hash — deterministic and
    // cheap; a k-means refinement would slot in here identically
    val cents: Array[(Int, Seq[Float])] = data
      .withColumn("__h", pmod(xxhash64(col(idCol)), lit(1000)))
      .where(col("__h") < lit(math.max(1, 1000 / nLists)))
      .select(col(embCol)).limit(nLists)
      .collect().zipWithIndex.map { case (r, i) => (i, r.getSeq[Float](0)) }
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

  private def cosineVal(a: Seq[Float], b: Seq[Float]): Double = {
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
    * used for embedding-level near-dup detection. The cosine is computed
    * and thresholded BEFORE the pair dedup, so the `groupBy(id1, id2)`
    * shuffle carries ids + one double instead of two full embeddings;
    * buckets over `maxBucket` rows are dropped (quadratic guard — see
    * Dedup.capBuckets). */
  def cosinePairs(df: DataFrame, idCol: String, embCol: String,
                  minCosine: Double, bits: Int = 16, bands: Int = 4,
                  maxBucket: Int = 4096): DataFrame = {
    require(bits % bands == 0)
    val width = bits / bands
    val sigU = udf((v: Seq[Float]) => signature(v, bits))
    val bandKey = udf((sig: Long, b: Int) => (sig >>> (b * width)) & ((1L << width) - 1))
    val banded = Dedup.capBuckets(
      df.select(col(idCol).as("id"), col(embCol).as("emb"))
        .withColumn("__sig", sigU(col("emb")))
        .withColumn("band", explode(sequence(lit(0), lit(bands - 1))))
        .withColumn("key", bandKey(col("__sig"), col("band"))),
      Seq("band", "key"), maxBucket)
    val l = banded.select(col("band"), col("key"), col("id").as("id1"), col("emb").as("emb1"))
    val r = banded.select(col("band"), col("key"), col("id").as("id2"), col("emb").as("emb2"))
    l.join(r, Seq("band", "key")).where(col("id1") < col("id2"))
      .withColumn("cosine", cosineUdf(col("emb1"), col("emb2")))
      .where(col("cosine") >= minCosine)
      .groupBy("id1", "id2").agg(first("cosine").as("cosine"))
      .select("id1", "id2", "cosine")
  }
}
