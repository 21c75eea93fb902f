package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Multimodal-column plumbing: image/audio/video content as opaque BINARY
  * columns with typed metadata, plus batch feature extraction.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A
  * DETERMINISTIC STUB (md5-derived pseudo-features) — clearly marked below.
  * Everything around it is the real engine surface: binary column schema,
  * partition-preserving batched extraction via mapPartitions (the Scala
  * analogue of mapInPandas: one iterator per partition, arbitrary
  * per-batch native calls), and a column-expression fast path for
  * metadata-only features.
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
