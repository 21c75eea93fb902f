package graft

import graft.operators.{Collection, Multimodal, Quantization, Search, Stats}
import graft.operators.Events
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("mapPartitions decode path produces identical features to the expression path") {
    val assets = Multimodal.loadAssets(spark, sf001)
    val expr = Multimodal.extractFeaturesExpr(assets)
      .as[Multimodal.AssetFeatures].collect().sortBy(_.asset_id)
    val part = Multimodal.extractFeaturesPartitioned(assets)
      .collect().sortBy(_.asset_id)
    assert(expr.length == part.length && expr.length > 0)
    assert(expr.zip(part).forall { case (a, b) => a == b })
  }

  test("codec seam: a swapped-in codec drives the same plumbing; stub stays default") {
    // a "real" codec stand-in: features from the raw bytes themselves
    // (first byte, last byte, length parity, media-type arity) — anything
    // deterministic that is NOT the stub's md5 arithmetic
    object ByteCodec extends Multimodal.MediaCodec {
      def open(): (String, Array[Byte]) => Array[Double] =
        (mt, bytes) => Array(
          (bytes(0) & 0xff) / 256.0,
          (bytes(bytes.length - 1) & 0xff) / 256.0,
          (bytes.length % 2).toDouble,
          mt.length.toDouble)
    }
    val assets = Multimodal.loadAssets(spark, sf001)
    val swapped = Multimodal.extractFeaturesPartitioned(assets, ByteCodec)
      .collect().sortBy(_.asset_id)
    val stub = Multimodal.extractFeaturesPartitioned(assets)
      .collect().sortBy(_.asset_id)
    assert(swapped.length == stub.length && swapped.length > 0)
    // same rows, same schema/keys — only the decoded features move
    assert(swapped.zip(stub).forall { case (a, b) =>
      a.asset_id == b.asset_id && a.media_type == b.media_type &&
        a.n_bytes == b.n_bytes
    })
    assert(swapped.exists(f => f.f3 == 5.0 || f.f3 == 4.0),
      "test codec's media-type-arity feature must flow through")
    assert(!swapped.sameElements(stub), "swapped codec must change features")
    // and the codec really decoded the bytes: recompute one row directly
    val one = assets.orderBy("asset_id").limit(1)
      .select("content", "media_type").collect()(0)
    val expect = ByteCodec.open()(one.getString(1), one.getAs[Array[Byte]](0))
    val got = swapped.head
    assert(Seq(got.f0, got.f1, got.f2, got.f3) == expect.toSeq)
  }

  test("JvmCodec really decodes: BMP pixels and WAV samples roundtrip exactly") {
    val assets = Multimodal.genEncodedAssets(spark, sf001, nAssets = 8)
      .collect().sortBy(_.asset_id)
    assert(assets.length == 8)
    // the bytes are genuine containers: the JDK readers accept them, and
    // the magic bytes prove real encodings — id%4==0 BMP ("BM"), id%4==2
    // PNG (compressed: 0x89 "PNG")
    val bmp = assets.find(_.asset_id == 0L).get.content
    assert(bmp(0) == 'B'.toByte && bmp(1) == 'M'.toByte, "BMP magic")
    val png = assets.find(_.asset_id == 2L).get.content
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P'.toByte &&
      png(2) == 'N'.toByte && png(3) == 'G'.toByte, "PNG magic")
    val img0 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bmp))
    assert(img0 != null && img0.getWidth == 8 && img0.getHeight == 8)
    val ais1 = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(assets.find(_.asset_id == 1L).get.content))
    assert(ais1.getFormat.getSampleRate == 8000f)
    // decoded features equal the closed-form content stats — i.e. the
    // codec read back EXACTLY the pixels/samples the writer put in
    val decode = Multimodal.JvmCodec.open()
    assets.foreach { a =>
      val f = decode(a.media_type, a.content)
      if (a.asset_id % 2 == 0) {
        val grays = for (y <- 0 until 8; x <- 0 until 8)
          yield (a.asset_id * 31 + x * 7 + y * 13) % 256
        assert(f(0) == 8.0 && f(1) == 8.0)
        assert(f(2) == graft.plans.Num.round6(grays.sum.toDouble / (64 * 255.0)))
        assert(f(3) == grays.max.toDouble)
      } else {
        val s = (0 until 256).map(i =>
          ((a.asset_id * 7919 + i * 31) % 65536) - 32768)
        assert(f(0) == 8000.0 && f(1) == 256.0)
        assert(f(2) == graft.plans.Num.round6(
          math.sqrt(s.map(v => v * v).sum.toDouble / 256) / 32768.0))
        assert(f(3) == s.sliding(2).count(p => p(0) * p(1) < 0).toDouble)
      }
    }
    // undecodable bytes fall back to the stub, not an error
    val junk = Array.fill[Byte](16)(7)
    assert(decode("image", junk).toSeq ==
      Multimodal.StubCodec.open()("image", junk).toSeq)
  }

  test("JvmCodec decodes genuine JPEG: JFIF magic, exact constant-gray stats") {
    val assets = Multimodal.genJpegAssets(spark, sf001, nAssets = 10)
      .collect().sortBy(_.asset_id)
    assert(assets.length == 10)
    val decode = Multimodal.JvmCodec.open()
    assets.foreach { a =>
      // real JPEG containers: SOI marker FF D8, JFIF APP0 marker FF E0
      val b = a.content
      assert((b(0) & 0xff) == 0xFF && (b(1) & 0xff) == 0xD8, "JPEG SOI")
      val g = ((a.asset_id * 31) % 256).toDouble
      val w = 8 + (a.asset_id % 5) * 4
      val h = 8 + (a.asset_id % 7) * 4
      val f = decode(a.media_type, b)
      assert(f(0) == w.toDouble && f(1) == h.toDouble,
        s"dims for ${a.asset_id}: got (${f(0)},${f(1)}) want ($w,$h)")
      // constant gray at quality 1.0 round-trips bit-exactly through the
      // DCT: mean = g/255 and max = g with no tolerance
      assert(f(2) == graft.plans.Num.round6(g / 255.0d),
        s"mean gray for ${a.asset_id}")
      assert(f(3) == g, s"max gray for ${a.asset_id}")
    }
  }

  test("binary content is opaque bytes with correct metadata") {
    val a = Multimodal.loadAssets(spark, sf001)
    val r = a.select("n_bytes").distinct().as[Long].collect()
    assert(r.toSeq == Seq(16L)) // md5 blob stand-in
    assert(a.select("media_type").distinct().count() == 3)
  }
}

class QuantizationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points = Collection.load(spark, sf001).cache()

  test("two-phase int8 rescore returns the exact top-k (oversampling covers the gap)") {
    val q = points.filter($"id" === 0).select($"embedding".as("qemb"))
    val twoPhase = Quantization.twoPhaseSearch(points, q, k = 10)
      .select("id").as[Long].collect().toSeq
    val exact = Search.knn(points, q, k = 10, threshold = -1.0)
      .select("id").as[Long].collect().toSeq
    assert(twoPhase == exact)
  }

  test("int8 cheap score approximates the true dot within quantization error") {
    val q = points.filter($"id" === 1).select($"embedding".as("qemb"))
    val err = points.crossJoin(broadcast(q))
      .select(abs(
        Quantization.int8Score(
          Quantization.quantize($"embedding"), Quantization.quantize($"qemb"))
          - graft.functions.VectorOps.dot($"embedding", $"qemb")).as("e"))
      .agg(max("e")).as[Double].head()
    assert(err < 0.05, s"quantization error $err too large") // ~2*sqrt(64)/127
  }
}

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("metric summary moments match direct computation") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 5.0))
      .toDF("g", "value")
    val r = Stats.metricSummary(df, Seq("g"), "value")
      .select("g", "n", "mean", "stddev_v", "p50")
      .as[(String, Long, Double, Option[Double], Double)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4, t._5)).toMap
    val (n, mean, sd, p50) = r("a")
    assert(n == 3 && mean == 2.0 && p50 == 2.0)
    assert(math.abs(sd.get - 1.0) < 1e-12)
    assert(r("b")._3.isEmpty, "stddev undefined for n=1")
  }

  test("summary over real events is stable and ordered") {
    val s = Stats.metricSummary(Events.load(spark, sf001), Seq("event_type"), "value")
    val types = s.select("event_type").as[String].collect()
    assert(types.sameElements(types.sorted))
    assert(s.count() == 5)
  }
}
