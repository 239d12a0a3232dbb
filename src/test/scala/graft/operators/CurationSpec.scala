package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTest

/** Substring-span dedup (Lee et al.), SemDeDup-style semantic dedup,
  * CCNet-style n-gram LM scoring, and distributed k-means — semantics
  * vs hand-computed / brute-force oracles. */
class CurationSpec extends AnyFunSuite with SparkTest {

  import spark.implicits._

  // ---- duplicateSpans / stripSpans ------------------------------------

  test("duplicateSpans finds planted cross-doc spans at the right positions") {
    val boiler = "q w e r t"
    val docs = Seq(
      (1L, "u1 u2 u3 u4 u5 u6 u7 u8"),            // all unique
      (2L, s"p1 p2 $boiler p3"),                   // boiler at tokens 2..6
      (3L, s"z1 $boiler z2 z3")                    // boiler at tokens 1..5
    ).toDF("id", "text")
    val spans = Dedup.duplicateSpans(docs, "id", "text", k = 3, minCount = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // 3-grams "q w e","w e r","e r t" each occur twice; islands merge them
    assert(spans == Set((2L, 2L, 5L, 3L), (3L, 1L, 5L, 3L)))
  }

  test("duplicateSpans merges within-doc repeats into one island") {
    val docs = Seq(
      (1L, "m n o m n o m n o"),   // every 3-gram repeats inside the doc
      (2L, "a1 a2 a3 a4 a5")
    ).toDF("id", "text")
    val spans = Dedup.duplicateSpans(docs, "id", "text", k = 3, minCount = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.toSeq == Seq((1L, 0L, 9L, 7L)))
  }

  test("duplicateSpans matches a brute-force oracle on a small random corpus") {
    val vocab = Array("k1", "k2", "k3", "k4", "k5", "k6")
    val rnd = new scala.util.Random(7)
    val k = 4
    val data = (0 until 40).map(i =>
      (i.toLong, Seq.fill(5 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.length))).mkString(" ")))
    val df = data.toDF("id", "text")
    val got = Dedup.duplicateSpans(df, "id", "text", k = k, minCount = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // brute force: global gram counts, per-doc hit positions, island merge
    val grams = data.flatMap { case (id, text) =>
      val t = text.split("\\s+").filter(_.nonEmpty)
      (0 to t.length - k).map(p => (id, p, t.slice(p, p + k).mkString(" ")))
    }
    val dup = grams.groupBy(_._3).filter(_._2.size >= 2).keySet
    val expected = grams.filter(g => dup.contains(g._3))
      .groupBy(_._1).flatMap { case (id, hs) =>
        val ps = hs.map(_._2).toSeq.sorted
        val islands = ps.tail.foldLeft(List(List(ps.head))) { (acc, p) =>
          if (p <= acc.head.head + k) (p :: acc.head) :: acc.tail else List(p) :: acc
        }
        islands.map { isl =>
          val s = isl.min; val e = isl.max + k
          (id, s.toLong, (e - s).toLong, isl.size.toLong)
        }
      }.toSet
    assert(got == expected)
    assert(expected.nonEmpty, "fixture produced no duplicated spans")
  }

  test("duplicationStats reports span-covered token fractions") {
    val boiler = "q w e r t"
    val docs = Seq(
      (1L, "u1 u2 u3 u4 u5 u6 u7 u8"),
      (2L, s"p1 p2 $boiler p3"),      // 5 of 8 tokens duplicated
      (3L, s"z1 $boiler z2 z3")       // 5 of 8
    ).toDF("id", "text")
    val out = Dedup.duplicationStats(docs, "id", "text", k = 3, minCount = 2)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((8L, 0L, 0L)))
    assert(out(2L) == ((8L, 5L, 625000L)))
    assert(out(3L) == ((8L, 5L, 625000L)))
  }

  test("stripSpans removes flagged tokens, keeps original case") {
    val docs = Seq(
      (1L, "P1 P2 Q W E R T P3"),
      (2L, "z1 q w e r t z2 z3")
    ).toDF("id", "text")
    val out = Dedup.stripSpans(docs, "id", "text", k = 3, minCount = 2)
      .select("id", "text_deduped").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out(1L) == "P1 P2 P3")
    assert(out(2L) == "z1 z2 z3")
  }

  // ---- c4LineFilter / dedupLines --------------------------------------

  test("c4LineFilter classifies lines once under the first failing rule") {
    val text = "Good first line with punctuation.\n  hi  \nno terminal punctuation here\n" +
      "Please enable JavaScript now.\nAnother good line here.\n\n{ bad brace"
    val df = Seq((1L, text)).toDF("id", "text")
    val r = TextAnalysis.c4LineFilter(df, "text").collect().head
    assert(r.getAs[Long]("n_lines") == 6)
    assert(r.getAs[Long]("n_kept") == 2)
    assert(r.getAs[Long]("dropped_short") == 1)     // "hi"
    assert(r.getAs[Long]("dropped_no_punct") == 2)  // bare line + "{ bad brace"
    assert(r.getAs[Long]("dropped_js") == 1)
    assert(!r.getAs[Boolean]("has_lorem"))
    assert(r.getAs[Boolean]("has_brace"))
    assert(!r.getAs[Boolean]("page_keep"))
    assert(r.getAs[String]("text_filtered") ==
      "Good first line with punctuation.\nAnother good line here.")
  }

  test("c4LineFilter keeps a clean page") {
    val text = "One fine line right here.\nA second decent line too.\nAnd a third one, yes."
    val r = TextAnalysis.c4LineFilter(Seq((1L, text)).toDF("id", "text"), "text")
      .collect().head
    assert(r.getAs[Long]("n_kept") == 3)
    assert(r.getAs[Boolean]("page_keep"))
    assert(r.getAs[String]("text_filtered") == text)
  }

  test("dedupLines removes all occurrences of corpus-duplicated lines, case-sensitive") {
    val docs = Seq(
      (1L, "unique one here.\nSHARED LINE\nanother unique."),
      (2L, "SHARED LINE\nsecond doc text."),
      (3L, "shared line\nthird doc."),
      (4L, "rep\nrep\nok.")
    ).toDF("id", "text")
    val out = TextAnalysis.dedupLines(docs, "id", "text")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((3L, 1L, "unique one here.\nanother unique.")))
    assert(out(2L) == ((2L, 1L, "second doc text.")))
    assert(out(3L) == ((2L, 0L, "shared line\nthird doc.")))  // case differs: not a dup
    assert(out(4L) == ((3L, 2L, "ok.")))                      // within-doc dup drops both
  }

  test("dedupLines keeps line-less documents with empty results") {
    val docs = Seq((1L, "a real line\na real line"), (2L, "   \n  ")).toDF("id", "text")
    val out = TextAnalysis.dedupLines(docs, "id", "text")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((2L, 2L, "")))
    assert(out(2L) == ((0L, 0L, "")))
  }

  // ---- semanticDedup ---------------------------------------------------

  test("semanticDedup keep set matches brute force within clusters") {
    val rnd = new scala.util.Random(11)
    val dim = 6
    // 4 well-separated cluster directions + small per-item noise
    val dirs = Array.tabulate(4, dim)((c, j) => if (j == c) 1.0 else 0.0)
    val data = (0 until 80).map { i =>
      val c = i % 4
      val v = Array.tabulate(dim)(j => (dirs(c)(j) + rnd.nextGaussian() * 0.05).toFloat)
      (i.toLong, v.toSeq)
    }
    val df = data.toDF("id", "emb")
    val cents = dirs.map(_.map(_.toFloat).toSeq)
    val tau = 0.98
    val got = Ann.semanticDedup(df, "id", "emb", tau, nLists = 4,
        centroids = Some(cents))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = a.map(x => x.toDouble * x.toDouble).sum
      val nb = b.map(x => x.toDouble * x.toDouble).sum
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def cluster(v: Seq[Float]): Int =
      cents.zipWithIndex.maxBy { case (c, i) => (cos(v, c), -i) }._2
    val byId = data.toMap
    got.foreach { case (id, cl, keep) =>
      assert(cl == cluster(byId(id)), s"cluster mismatch for $id")
      val expectKeep = !data.exists { case (o, v) =>
        o < id && cluster(v) == cl && cos(v, byId(id)) >= tau
      }
      assert(keep == expectKeep, s"keep mismatch for $id")
    }
    assert(got.count(!_._3) > 0, "fixture dropped nothing")
    assert(got.count(_._3) >= 4, "fewer survivors than clusters")
  }

  test("semanticDedup survives null and mis-sized embeddings (cluster -1, kept)") {
    val data: Seq[(Long, Option[Seq[Float]])] = Seq(
      (0L, Some(Seq(1f, 0f))), (1L, Some(Seq(1f, 0f))),   // dup pair
      (2L, None), (3L, None),                              // nulls must not pair/NPE
      (4L, Some(Seq(1f, 0f, 9f))),                         // mis-sized vs centroids
      (5L, Some(Seq(0f, 1f))))
    val df = data.toDF("id", "emb")
    val cents = Array(Seq(1f, 0f), Seq(0f, 1f))
    val out = Ann.semanticDedup(df, "id", "emb", tau = 0.99, nLists = 2,
        centroids = Some(cents))
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getBoolean(2)))).toMap
    assert(out.size == 6)
    assert(out(1L) == ((0, false)))          // dominated by id 0
    assert(out(0L) == ((0, true)))
    assert(out(2L) == ((-1, true)) && out(3L) == ((-1, true)))
    assert(out(4L) == ((-1, true)))
    assert(out(5L) == ((1, true)))
  }

  test("kmeans sampling skips null embeddings; init size must match k") {
    val df = (Seq((0L, Option(Seq(0f, 0f))), (1L, None)) ++
      (2 until 20).map(i => (i.toLong, Option(Seq(i.toFloat, 0f))))).toDF("id", "emb")
    val (cents, assigned) = Ann.kmeans(df, "id", "emb", k = 2, iters = 2)
    assert(cents.length == 2 && cents.forall(_ != null))
    assert(assigned.where(col("cluster") === -1).count() == 1) // the null row
    val e = intercept[IllegalArgumentException] {
      Ann.kmeans(df, "id", "emb", k = 3, init = Some(Array(Seq(0f, 0f))))
    }
    assert(e.getMessage.contains("centroids"))
  }

  // ---- lmScore ---------------------------------------------------------

  test("lmScore matches the hand-computed add-one bigram model") {
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "z")).toDF("id", "text")
    val out = TextAnalysis.lmScore(docs, "id", "text")
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) null else r.getLong(3)))).toMap
    // corpus bigrams: (a,b) x3, (b,a) x1; c1(a)=3, c1(b)=1; V=|{a,b}|=2
    // p(a,b)=(3+1)/(3+2)=0.8 -> lnp_e6 = floor(ln(.8)*1e6+.5) = -223144
    // p(b,a)=(1+1)/(1+2)     -> lnp_e6 = floor(ln(2/3)*1e6+.5) = -405465
    val lnAB = math.floor(math.log(0.8) * 1e6 + 0.5).toLong
    val lnBA = math.floor(math.log(2.0 / 3.0) * 1e6 + 0.5).toLong
    assert(out(1L) == ((3L, 2 * lnAB + lnBA,
      math.floor(-(2 * lnAB + lnBA).toDouble / 3 + 0.5).toLong)))
    assert(out(2L) == ((1L, lnAB, -lnAB)))
    assert(out(3L) == ((0L, 0L, null)))
  }

  test("lmScore against an external LM corpus handles unseen mass") {
    val lm = Seq((10L, "a b a b")).toDF("id", "text") // c12(a,b)=2,(b,a)=1; c1(a)=2,c1(b)=1; V=2
    val docs = Seq((1L, "a q"), (2L, "q z")).toDF("id", "text")
    val out = TextAnalysis.lmScore(docs, "id", "text", lm = Some((lm, "text")))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // (a,q): unseen bigram, known first word -> (0+1)/(2+2)
    assert(out(1L) == math.floor(math.log(1.0 / 4.0) * 1e6 + 0.5).toLong)
    // (q,z): unknown first word -> (0+1)/(0+2)
    assert(out(2L) == math.floor(math.log(1.0 / 2.0) * 1e6 + 0.5).toLong)
  }

  // ---- plan shapes (the scale contracts) -------------------------------

  test("plan shapes: spans/semantic/lm/tfidf/c4 keep their scale contracts") {
    val docs = (0 until 50)
      .map(i => (i.toLong, s"w$i common tail words here again w${i % 7} end"))
      .toDF("id", "text")

    // c4LineFilter is one projection: no shuffle anywhere
    val c4Plan = TextAnalysis.c4LineFilter(docs, "text")
      .queryExecution.executedPlan.toString
    assert(!c4Plan.contains("Exchange"), s"unexpected shuffle in:\n$c4Plan")

    // duplicateSpans: the gram stream is cached once (InMemoryRelation)
    // and the island merge is the ONLY window, partitioned by document
    val spansPlan = Dedup.duplicateSpans(docs, "id", "text", k = 3)
      .queryExecution.executedPlan.toString
    assert(spansPlan.contains("InMemoryTableScan"), s"gram stream not cached:\n$spansPlan")
    val allWindows = "windowspecdefinition\\(".r.findAllIn(spansPlan).size
    val idWindows = "windowspecdefinition\\(id".r.findAllIn(spansPlan).size
    assert(allWindows > 0 && allWindows == idWindows,
      s"non-doc-partitioned window in:\n$spansPlan")

    // lmScore: aggregates only — no window, no sort-based global op
    val lmPlan = TextAnalysis.lmScore(docs, "id", "text")
      .queryExecution.executedPlan.toString
    assert(!lmPlan.contains("Window"), s"unexpected window in:\n$lmPlan")

    // tfIdf: the top-k window partitions by document (never a global
    // single-partition window over the corpus)
    val tfPlan = TextAnalysis.tfIdfTopTerms(docs, "id", "text", k = 2)
      .queryExecution.executedPlan.toString
    assert(tfPlan.contains("windowspecdefinition(id"), tfPlan)

    // semanticDedup: pairs form via the cluster equi-join — no
    // cartesian product anywhere
    val cents = Array(Seq(1f, 0f), Seq(0f, 1f))
    val e = docs.selectExpr("id",
      "array(CAST(id % 2 AS FLOAT), CAST((id + 1) % 2 AS FLOAT)) AS emb")
    val sdPlan = Ann.semanticDedup(e, "id", "emb", tau = 0.9, nLists = 2,
        centroids = Some(cents))
      .queryExecution.executedPlan.toString
    assert(!sdPlan.contains("CartesianProduct"), s"cartesian in:\n$sdPlan")
  }

  // ---- tfIdfTopTerms ---------------------------------------------------

  test("tfIdfTopTerms matches the hand-computed smoothed-idf weights") {
    val docs = Seq((1L, "apple banana apple"), (2L, "banana cherry")).toDF("id", "text")
    val out = TextAnalysis.tfIdfTopTerms(docs, "id", "text", k = 2)
      .collect().map(r => ((r.getLong(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // N=2; idf_e6: apple/cherry = floor((ln(3/2)+1)*1e6+.5) = 1405465, banana = 1000000
    assert(out((1L, "apple")) == ((2L, 1L, 2L * 1405465L, 1L)))
    assert(out((1L, "banana")) == ((1L, 2L, 1000000L, 2L)))
    assert(out((2L, "cherry")) == ((1L, 1L, 1405465L, 1L)))
    assert(out((2L, "banana")) == ((1L, 2L, 1000000L, 2L)))
    assert(out.size == 4)
  }

  // ---- kmeans ----------------------------------------------------------

  test("kmeans converges to the planted cluster means") {
    val data = (0 until 60).map { i =>
      val c = i % 3
      // dyadic offsets -> exact arithmetic; clusters at x=0, 10, 20
      (i.toLong, Seq((c * 10 + (i % 5) / 4.0).toFloat, (c % 2).toFloat))
    }
    val df = data.toDF("id", "emb")
    val init = Array(Seq(0f, 0f), Seq(10f, 1f), Seq(20f, 0f))
    val (cents, assigned) = Ann.kmeans(df, "id", "emb", k = 3, iters = 4,
      init = Some(init))
    // per-cluster mean of (i % 5)/4 over i ≡ c (mod 3), i < 60
    (0 until 3).foreach { c =>
      val members = data.filter(_._1 % 3 == c)
      val mx = members.map(_._2.head.toDouble).sum / members.size
      val my = members.map(_._2(1).toDouble).sum / members.size
      assert(cents(c)(0) == mx, s"x mean, cluster $c")
      assert(cents(c)(1) == my, s"y mean, cluster $c")
    }
    val a = assigned.collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    data.foreach { case (id, _) => assert(a(id) == (id % 3).toInt) }
  }

  test("kmeans-trained centroids plug into semanticDedup") {
    val data = (0 until 40).map { i =>
      val c = i % 2
      (i.toLong, Seq(if (c == 0) 1f else 0f, if (c == 0) 0f else 1f, (i % 4) / 8f))
    }
    val df = data.toDF("id", "emb")
    val (cents, _) = Ann.kmeans(df, "id", "emb", k = 2, iters = 3,
      init = Some(Array(Seq(1f, 0f, 0f), Seq(0f, 1f, 0f))))
    val out = Ann.semanticDedup(df, "id", "emb", tau = 0.999, nLists = 2,
        centroids = Some(cents.map(_.map(_.toFloat).toSeq)))
      .collect()
    assert(out.length == 40)
    // identical (c, i%4) pairs exist -> something must drop, something keep
    assert(out.count(_.getBoolean(2)) >= 2)
    assert(out.count(!_.getBoolean(2)) > 0)
  }
}
