package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Multimodal-column plumbing: image/audio/video content as opaque BINARY
  * columns with typed metadata, plus batch feature extraction.
  *
  * Two codecs ride the seam: [[JvmCodec]] is a REAL decoder (BMP, PNG
  * and JPEG via javax.imageio — the stock JDK ships readers for all
  * three, JPEG included — and WAV PCM via javax.sound.sampled; no
  * native libs), exercised end-to-end by `multimodal_decode` (BMP/PNG/
  * WAV) and `multimodal_decode_jpeg` (compressed-photographic
  * containers, [[genJpegAssets]]) over genuinely encoded bytes;
  * [[StubCodec]] remains the default for formats this container cannot
  * decode (MP3/video need native libs) and for the opaque md5-blob
  * fixture.
  * Everything around the codecs is the real engine surface: binary
  * column schema, partition-preserving batched extraction via
  * mapPartitions (the Scala analogue of mapInPandas: one iterator per
  * partition, arbitrary per-batch native calls), and a column-expression
  * fast path for metadata-only features.
  *
  * Scale notes: binary payloads make row sizes large — the asset table
  * should set spark.sql.files.maxPartitionBytes so a partition's decoded
  * batch fits executor memory, and feature extraction is map-only (no
  * shuffle); only the small (asset_id, features) projection flows onward.
  */
object Multimodal {

  /** Derive a deterministic asset table from the documents fixture:
    * content = unhex(md5(text)) (a 16-byte opaque blob standing in for
    * encoded media), media_type cycling by doc_id, n_bytes metadata. */
  def loadAssets(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        col("doc_id").as("asset_id"),
        unhex(md5(col("text"))).as("content"),
        when(pmod(col("doc_id"), lit(3)) === 0, "image")
          .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
          .otherwise("video").as("media_type"),
        length(unhex(md5(col("text")))).cast("long").as("n_bytes"))

  /** Column-expression feature extraction (metadata-path): 4 pseudo-features
    * from the content hex — STUB for "decode then embed". */
  def extractFeaturesExpr(assets: DataFrame): DataFrame = {
    val hx = lower(hex(col("content")))
    val fs = (0 until 4).map(i =>
      (pmod(TextOps.hash60(concat(hx, lit(i.toString))), lit(1000L)).cast("double")
        / 1000.0d).as(s"f$i"))
    assets.select(Seq(col("asset_id"), col("media_type"), col("n_bytes")) ++ fs: _*)
      .orderBy("asset_id")
  }

  final case class Asset(asset_id: Long, content: Array[Byte],
      media_type: String, n_bytes: Long)
  final case class AssetFeatures(asset_id: Long, media_type: String,
      n_bytes: Long, f0: Double, f1: Double, f2: Double, f3: Double)

  /** The pluggable decode seam: a codec is shipped to executors
    * (Serializable) and `open()`ed ONCE PER PARTITION — where a real
    * integration initializes its native decoder (JNI image library, audio
    * resampler, frame sampler) and amortizes that cost over the
    * partition's batch. The returned function decodes one asset's bytes
    * into the fixed-width feature vector. */
  trait MediaCodec extends Serializable {
    /** Per-partition init; returns (media_type, content) => 4 features. */
    def open(): (String, Array[Byte]) => Array[Double]
  }

  /** Default codec: THE STUB — this container has no media codecs, so
    * decode derives deterministic md5 pseudo-features from the bytes.
    * Identical arithmetic to [[extractFeaturesExpr]]'s expression twin,
    * which is what keeps the two paths differential-testable. */
  object StubCodec extends MediaCodec {
    def open(): (String, Array[Byte]) => Array[Double] = {
      // >>> STUB DECODE: a real implementation decodes image/audio bytes
      // here (per-partition codec init, batched native calls). We derive
      // deterministic pseudo-features from the bytes instead. <<<
      val md = MessageDigest.getInstance("MD5")
      def hash60(s: String): Long = {
        val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex.take(15), 16)
      }
      (_, content) => {
        val hx = content.map("%02x".format(_)).mkString
        Array.tabulate(4)(i => (hash60(hx + i.toString) % 1000L).toDouble / 1000.0d)
      }
    }
  }

  /** REAL pure-JVM codec (no native libs — both decoders ship in the
    * JDK): BMP (and any ImageIO-readable format) via `javax.imageio`,
    * WAV PCM via `javax.sound.sampled`. Features:
    *  - image: f0 = width, f1 = height, f2 = mean gray / 255 (gray =
    *    (r+g+b)/3 per pixel, integer sum then one rounded divide),
    *    f3 = max gray;
    *  - audio: f0 = sample rate, f1 = sample count, f2 = RMS amplitude /
    *    32768 (exact integer sum of squares, then sqrt), f3 = zero
    *    crossings.
    * Integer accumulation keeps every feature deterministic and
    * SQL-expressible for closed-form content ([[genEncodedAssets]]), so
    * the decode path gets a full hash-match oracle. Bytes that are not
    * decodable media (e.g. the md5-blob fixture of [[loadAssets]]) fall
    * back to the stub — the seam stays a total function. */
  object JvmCodec extends MediaCodec {
    def open(): (String, Array[Byte]) => Array[Double] = {
      val stub = StubCodec.open()
      (mediaType, content) =>
        try {
          mediaType match {
            case "image" =>
              val img = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(content))
              if (img == null) stub(mediaType, content)
              else {
                val w = img.getWidth
                val h = img.getHeight
                val raster = img.getRaster
                val gray1Band = raster.getNumBands == 1
                var sum = 0L
                var mx = 0L
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) {
                    // single-band (grayscale JPEG/PNG): read the raster
                    // sample directly — getRGB would route it through a
                    // gray→sRGB ColorSpace conversion (gamma) and report
                    // values that aren't the decoded samples
                    val g =
                      if (gray1Band) raster.getSample(x, y, 0)
                      else {
                        val rgb = img.getRGB(x, y)
                        (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
                          (rgb & 0xff)) / 3
                      }
                    sum += g
                    if (g > mx) mx = g
                    x += 1
                  }
                  y += 1
                }
                Array(w.toDouble, h.toDouble,
                  graft.plans.Num.round6(sum.toDouble / (w * h * 255.0d)),
                  mx.toDouble)
              }
            case "audio" =>
              val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(content))
              val fmt = ais.getFormat
              require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
                s"JvmCodec expects 16-bit mono PCM, got $fmt")
              val bytes = ais.readAllBytes()
              val n = bytes.length / 2
              var sumSq = 0L
              var zc = 0L
              var prev = 0
              var i = 0
              while (i < n) {
                val b0 = bytes(2 * i)      // first byte: MSB if BE, LSB if LE
                val b1 = bytes(2 * i + 1)
                val s = if (fmt.isBigEndian) (b0.toInt << 8) | (b1 & 0xff)
                  else (b1.toInt << 8) | (b0 & 0xff)
                sumSq += s.toLong * s
                if (i > 0 && s.toLong * prev < 0) zc += 1
                prev = s
                i += 1
              }
              Array(fmt.getSampleRate.toDouble, n.toDouble,
                graft.plans.Num.round6(
                  math.sqrt(sumSq.toDouble / n) / 32768.0d),
                zc.toDouble)
            case _ => stub(mediaType, content)
          }
        } catch { case _: Exception => stub(mediaType, content) }
    }
  }

  /** Genuine encoded-media fixture: per doc_id an 8×8 24-bit BMP (even
    * ids) or a 256-sample 16-bit mono PCM WAV at 8 kHz (odd ids), ENCODED
    * on executors with the JDK's own writers — real bytes through the
    * real decode seam. Content is closed-form — pixel gray(x,y) =
    * (id·31 + x·7 + y·13) mod 256, sample sᵢ = ((id·7919 + i·31) mod
    * 65536) − 32768 — so the DECODED stats are computable by the DuckDB
    * oracle from doc_id alone and `multimodal_decode` hash-matches
    * end-to-end (encode → container bytes → decode → features). */
  def genEncodedAssets(spark: SparkSession, sfDir: String,
      nAssets: Int = 40): Dataset[Asset] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id")).filter(col("doc_id") < nAssets)
      .as[Long]
      .map { id =>
        if (id % 2 == 0) {
          val img = new java.awt.image.BufferedImage(
            8, 8, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              val g = ((id * 31 + x * 7 + y * 13) % 256).toInt
              img.setRGB(x, y, (g << 16) | (g << 8) | g)
              x += 1
            }
            y += 1
          }
          // alternate a raw container (BMP) with a genuinely COMPRESSED
          // one (PNG/DEFLATE) — both lossless, so the decoded pixel stats
          // (and the closed-form oracle) are format-independent; the
          // codec dispatches by content sniffing, not by format name
          val fmt = if (id % 4 == 0) "bmp" else "png"
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, fmt, bos)
          Asset(id, bos.toByteArray, "image", bos.size().toLong)
        } else {
          val n = 256
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val s = (((id * 7919 + i * 31) % 65536) - 32768).toInt
            pcm(2 * i) = (s & 0xff).toByte       // little-endian
            pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
            true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          Asset(id, bos.toByteArray, "audio", bos.size().toLong)
        }
      }
  }

  /** Genuine JPEG fixture — the compressed-PHOTOGRAPHIC container (DCT +
    * Huffman, the most common real-corpus image format), encoded on
    * executors with the JDK's own `jpg` ImageWriter at explicit quality
    * 1.0. JPEG is lossy in general, so closed-form decodability needs
    * content the DCT quantizes losslessly: CONSTANT-GRAY images. A
    * constant block's DCT is a lone DC coefficient; at quality 1.0 the
    * quantization tables are 1s, so the round trip is bit-exact for
    * every gray level and dimension (verified over all 256 grays ×
    * mixed dims — block-padding at non-multiple-of-8 edges replicates
    * the constant and stays exact). gray g = (id·31) mod 256, w = 8 +
    * (id mod 5)·4, h = 8 + (id mod 7)·4, so decoded (w, h, mean=g/255,
    * max=g) are computable by the oracle from doc_id alone while the
    * bytes still traverse the full JFIF/DCT/Huffman decode pipeline. */
  def genJpegAssets(spark: SparkSession, sfDir: String,
      nAssets: Int = 30): Dataset[Asset] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id")).filter(col("doc_id") < nAssets)
      .as[Long]
      .map { id =>
        val g = ((id * 31) % 256).toInt
        val w = 8 + (id % 5).toInt * 4
        val h = 8 + (id % 7).toInt * 4
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.getRaster.setSample(x, y, 0, g); x += 1 }
          y += 1
        }
        val wr = javax.imageio.ImageIO
          .getImageWritersByFormatName("jpg").next()
        val p = wr.getDefaultWriteParam
        p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        p.setCompressionQuality(1.0f)
        val bos = new java.io.ByteArrayOutputStream()
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
        wr.setOutput(ios)
        wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
        wr.dispose()
        ios.flush()
        Asset(id, bos.toByteArray, "image", bos.size().toLong)
      }
  }

  /** Batched decode path: one iterator per partition, native per-batch work
    * inside — the shape a real codec integration uses (the Scala analogue
    * of mapInPandas). The codec is the seam: the default stays the
    * deterministic stub; swapping in a real [[MediaCodec]] changes no
    * plumbing (schema, partitioning, batching are codec-independent —
    * spec-asserted with a test codec). */
  def extractFeaturesPartitioned(assets: DataFrame,
      codec: MediaCodec = StubCodec): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.as[Asset].mapPartitions { it =>
      val decode = codec.open() // once per partition
      it.map { a =>
        val f = decode(a.media_type, a.content)
        AssetFeatures(a.asset_id, a.media_type, a.n_bytes,
          f(0), f(1), f(2), f(3))
      }
    }
  }

  /** Per-media-type rollup over extracted features. */
  def mediaSummary(features: DataFrame): DataFrame =
    features.groupBy("media_type")
      .agg(count("*").cast("long").as("n_assets"),
        sum("n_bytes").cast("long").as("total_bytes"),
        (sum(col("f0").cast("decimal(18,3)")).cast("double") / count("*")).as("avg_f0"))
      .orderBy("media_type")
}
