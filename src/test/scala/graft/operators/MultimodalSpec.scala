package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTest
import graft.images.{ImageCodec, SyntheticImages}
import graft.cells.XZ3
import graft.cells.BinnedTime

/** Multimodal operators over real PNG/JPEG payloads + XZ3 kernel. */
class MultimodalSpec extends AnyFunSuite with SparkTest {

  private lazy val imgs = SyntheticImages.table(spark, 60, partitions = 4).toDF()

  test("image feature extraction: dims, stats, phash, corrupt tolerance") {
    import spark.implicits._
    val withBad = imgs.union(
      Seq(("imgBAD", Array[Byte](1, 2, 3), 0, 0, "png", "x", 0L))
        .toDF("image_id", "bytes", "w", "h", "fmt", "caption", "phash"))
    val feats = Multimodal.imageFeatures(spark, withBad).collect()
    assert(feats.length == 61)
    val bad = feats.filter(!_.decode_ok)
    assert(bad.map(_.image_id).toSeq == Seq("imgBAD"))
    val ok = feats.filter(_.decode_ok)
    ok.foreach { f =>
      assert(Set(64, 128, 256).contains(f.width) && Set(64, 128, 256).contains(f.height))
      assert(f.mean_r >= 0 && f.mean_r <= 255 && f.luma_std >= 0)
    }
    // phash from features equals the stored column (same decode path)
    val stored = imgs.select("image_id", "phash").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    ok.foreach { f =>
      assert(ImageCodec.hammingDistance(f.phash, stored(f.image_id)) <= 6)
    }
  }

  test("cleanImages: one fate per image across all gates and phash dedup") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    def png(img: BufferedImage): Array[Byte] = ImageCodec.encodePng(img)
    def solid(w: Int, h: Int, rgb: Int): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
      img
    }
    def gradient(w: Int, h: Int): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach(x =>
        img.setRGB(x, y, ((x * 255 / w) << 16) | ((y * 255 / math.max(1, h - 1)) << 8) | 128)))
      img
    }
    val good = png(SyntheticImages.render(7L))          // 64-256 px pattern
    val rows = Seq(
      ("keepA", good),
      ("keepB_dup", good),                              // identical -> same phash
      ("corrupt", Array[Byte](9, 9, 9)),
      ("tiny", png(solid(8, 8, 0x123456))),
      ("banner", png(gradient(512, 32))),
      ("blank", png(solid(128, 128, 0x808080)))         // zero variance
    ).toDF("image_id", "bytes")
    val out = Multimodal.cleanImages(spark, rows, minDim = 16, maxAspect = 4.0)
      .select("image_id", "fate").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("keepA") == "kept")
    assert(out("keepB_dup") == "phash_dup")
    assert(out("corrupt") == "decode_fail")
    assert(out("tiny") == "too_small")
    assert(out("banner") == "extreme_aspect")
    assert(out("blank") == "low_variance")
  }

  test("q_clean_images precondition: the 60 planted renders have pairwise-distinct decode-phashes") {
    // the driver oracle equates phash groups with duplicate-id groups;
    // that is only valid if no two DIFFERENT renders collide in aHash
    val phashes = (0L until 60L).map { id =>
      val row = SyntheticImages.row(id)
      id -> ImageCodec.averageHash(ImageCodec.decode(row.bytes))
    }
    val collisions = phashes.groupBy(_._2).filter(_._2.size > 1).values.toSeq
    assert(collisions.isEmpty, s"phash collisions among distinct renders: $collisions")
  }

  test("resize bounds the max dimension, preserves aspect, stays decodable") {
    val out = Multimodal.resize(spark, imgs, maxDim = 32).collect()
    assert(out.length == 60)
    out.foreach { r =>
      val w = r.getAs[Int]("thumb_w"); val h = r.getAs[Int]("thumb_h")
      assert(math.max(w, h) <= 32)
      val dec = ImageCodec.decode(r.getAs[Array[Byte]]("thumb_bytes"))
      assert(dec.getWidth == w && dec.getHeight == h)
    }
  }

  test("phash near-dup blocking equals brute-force hamming filter") {
    import spark.implicits._
    val hs = imgs.select("image_id", "phash").collect().map(r => (r.getString(0), r.getLong(1)))
    val pairsDf = Multimodal.phashPairs(imgs, "image_id", "phash", maxDist = 10)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val brute = (for {
      (i, hi) <- hs; (j, hj) <- hs if i < j
      if java.lang.Long.bitCount(hi ^ hj) <= 10
    } yield (i, j)).toSet
    assert(pairsDf == brute)
  }

  test("XZ3: intersecting-window cover includes the element's code") {
    val xz = XZ3(10, BinnedTime.Week)
    val rnd = new scala.util.Random(42)
    (1 to 40).foreach { _ =>
      val lon = rnd.nextDouble() * 300 - 150
      val lat = rnd.nextDouble() * 150 - 75
      val off = (rnd.nextDouble() * 500000).toLong
      val code = xz.index(lon, lat, off, lon + 1, lat + 1, off + 3600)
      val cover = xz.ranges(lon - 2, lat - 2, math.max(0, off - 7200),
        lon + 3, lat + 3, off + 10800)
      assert(cover.exists(r => code >= r.lower && code <= r.upper))
    }
    // disjoint in time excludes
    val code = xz.index(10, 10, 1000, 11, 11, 2000)
    val far = xz.ranges(10, 10, 400000, 11, 11, 500000)
    assert(!far.exists(r => code >= r.lower && code <= r.upper))
  }

  test("audio features: real WAV PCM decode (RMS of a sine ~ amp/sqrt(2), zero crossings ~ 2*cycles)") {
    import spark.implicits._
    val df = (0 until 20).map(i => (s"a$i", graft.images.SyntheticMedia.wav(i.toLong)))
      .toDF("audio_id", "bytes")
    val out = Multimodal.audioFeatures(spark, df).collect()
    assert(out.length == 20 && out.forall(_.decode_ok))
    out.foreach { f =>
      assert(f.sample_rate == 8000 && f.channels == 1)
      assert(math.abs(f.duration_s - 0.5) < 1e-9)
      // amp in [0.3, 0.8]; rms of sine = amp/sqrt(2); noise floor 0.02
      assert(f.rms > 0.3 / math.sqrt(2.0) - 0.05 && f.rms < 0.8 / math.sqrt(2.0) + 0.05, s"rms ${f.rms}")
      assert(f.peak > 0.25 && f.peak <= 1.0)
      // freq 200..1223 Hz over 0.5s -> ~200..1224 crossings (2 per cycle)
      assert(f.zero_crossings > 150 && f.zero_crossings < 1400, s"zc ${f.zero_crossings}")
    }
    // corrupted payload is data, not an exception
    val bad = Multimodal.audioFeatures(spark,
      Seq(("x", Array[Byte](1, 2, 3))).toDF("audio_id", "bytes")).collect()
    assert(bad.length == 1 && !bad.head.decode_ok)
  }

  test("video frame sampling: stride, timestamps, deterministic stub decode") {
    import spark.implicits._
    val df = (0 until 5).map(i => (s"v$i", graft.images.SyntheticMedia.video(i.toLong, nFrames = 30, fps = 10)))
      .toDF("video_id", "bytes")
    val out = Multimodal.frameSample(spark, df, everyN = 5).collect()
    assert(out.length == 5 * 6) // frames 0,5,10,15,20,25
    val v0 = out.filter(_.video_id == "v0").sortBy(_.frame_idx)
    assert(v0.map(_.frame_idx).toSeq == Seq(0, 5, 10, 15, 20, 25))
    assert(v0.map(_.ts_ms).toSeq == Seq(0L, 500L, 1000L, 1500L, 2000L, 2500L))
    assert(v0.forall(f => f.width == 64 && f.height == 48 && f.decode_ok))
    // deterministic: same id -> same frame hashes on a second run
    val again = Multimodal.frameSample(spark, df, everyN = 5).collect()
      .filter(_.video_id == "v0").sortBy(_.frame_idx).map(_.frame_hash).toSeq
    assert(again == v0.map(_.frame_hash).toSeq)
    // distinct frames hash differently (stub is per-frame seeded)
    assert(v0.map(_.frame_hash).distinct.length == 6)
    val bad = Multimodal.frameSample(spark,
      Seq(("x", Array[Byte](9, 9))).toDF("video_id", "bytes"), everyN = 2).collect()
    assert(bad.length == 1 && !bad.head.decode_ok)
  }

  test("audio decode: negative chunk length is data, not a hang") {
    import spark.implicits._
    // RIFF/WAVE header followed by a chunk whose length is -8: the walk
    // advance would be zero — must yield decode_ok=false, not spin
    val b = java.nio.ByteBuffer.allocate(24).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("ASCII")).putInt(16).put("WAVE".getBytes("ASCII"))
    b.put("junk".getBytes("ASCII")).putInt(-8)
    val out = Multimodal.audioFeatures(spark,
      Seq(("evil", b.array())).toDF("audio_id", "bytes")).collect()
    assert(out.length == 1 && !out.head.decode_ok)
  }
}
