package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Distributed reader for FAISS `IndexFlat` index files — the second branch
  * of the reference's bulk loader (scripts/migrate_from_faiss.py:66-72:
  * `faiss.read_index(path)` + `index.reconstruct_n(0, ntotal)` when the
  * file is not `.npy`). A flat index stores its vectors verbatim, so
  * reconstruct_n is exactly "read the contiguous float32 matrix" — which
  * this source does Spark-side with the same byte-range pattern as
  * [[NpySource]]: header parsed once on the driver, row ranges fetched
  * per-partition across executors.
  *
  * Format (public FAISS serialization, faiss/impl/index_write.cpp):
  * fourcc (4B: "IxFI" inner-product / "IxF2" L2 / legacy "IxFl"), then the
  * common index header — d (int32 LE), ntotal (int64 LE), two dummy
  * int64s, is_trained (1 byte), metric_type (int32 LE) — then the code
  * vector: an int64 element count followed by raw little-endian float32
  * data. Modern fourccs store codes as a BYTE vector (count = ntotal·d·4);
  * the legacy "IxFl" fourcc stored a FLOAT vector (count = ntotal·d).
  * Both are accepted; every other index family (IVF, HNSW, PQ) is
  * rejected loudly — reconstructing those requires their codebooks, which
  * is precisely what the reference delegates to the faiss library and a
  * flat file doesn't need. */
object FaissSource {

  /** Parsed IndexFlat header: data offset, shape, metric fourcc. */
  final case class FaissHeader(
      dataOffset: Long, rows: Long, cols: Int, metric: String)

  private val HeaderLen = 45 // 4 fourcc + 4 d + 8 ntotal + 16 dummy + 1 trained + 4 metric + 8 vec size

  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  private def i64(b: Array[Byte], o: Int): Long =
    (0 until 8).map(i => (b(o + i) & 0xffL) << (8 * i)).reduce(_ | _)

  private[graft] def parseHeader(head: Array[Byte]): FaissHeader = {
    require(head.length >= HeaderLen, "FAISS header truncated")
    val fourcc = new String(head, 0, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
    require(Set("IxFI", "IxF2", "IxFl").contains(fourcc),
      s"not a FAISS IndexFlat file (fourcc '$fourcc'); " +
        "IVF/HNSW/PQ indexes need their codebooks and are not supported")
    val d = i32(head, 4)
    val ntotal = i64(head, 8)
    // head(24,16) = two dummy int64s; head(32) = is_trained
    val metricType = i32(head, 33)
    require(metricType == 0 || metricType == 1,
      s"unsupported metric_type $metricType (need INNER_PRODUCT or L2)")
    val vecCount = i64(head, 37)
    val expected = if (fourcc == "IxFl") ntotal * d else ntotal * d * 4L
    require(vecCount == expected,
      s"code vector length $vecCount != expected $expected for ntotal=$ntotal d=$d")
    require(d > 0 && ntotal >= 0, s"bad shape ($ntotal, $d)")
    FaissHeader(HeaderLen.toLong, ntotal, d, fourcc)
  }

  /** Read an IndexFlat file as (vec_id, embedding: array<double>), vec_id =
    * row index — the distributed reconstruct_n. Same scale shape as
    * [[NpySource.readVectors]]: contiguous per-partition byte ranges, one
    * seek + sequential scan each. */
  def readVectors(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val h = {
      val p = new Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val in = fs.open(p)
      try {
        val head = new Array[Byte](HeaderLen)
        in.readFully(0, head, 0, head.length)
        parseHeader(head)
      } finally in.close()
    }
    val cols = h.cols
    val rowBytes = cols.toLong * 4
    val dataOffset = h.dataOffset
    spark.range(0, h.rows)
      .mapPartitions { it =>
        val ids = it.toArray
        if (ids.isEmpty) Iterator.empty
        else {
          val p = new Path(path)
          val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
          val in = fs.open(p)
          Option(org.apache.spark.TaskContext.get())
            .foreach(_.addTaskCompletionListener[Unit](_ => in.close()))
          in.seek(dataOffset + ids.head * rowBytes)
          val buf = new Array[Byte](rowBytes.toInt)
          var emitted = 0
          new Iterator[(Long, Array[Double])] {
            def hasNext: Boolean = emitted < ids.length
            def next(): (Long, Array[Double]) = {
              in.readFully(buf, 0, buf.length)
              val bb = java.nio.ByteBuffer.wrap(buf)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN)
              val v = new Array[Double](cols)
              var j = 0
              while (j < cols) { v(j) = bb.getFloat(j * 4).toDouble; j += 1 }
              val id = ids(emitted)
              emitted += 1
              (id, v)
            }
          }
        }
      }
      .toDF("vec_id", "embedding")
  }

  /** Driver-side IndexFlatIP writer — fixture/interop utility standing in
    * for the foreign FAISS system that produced the file; the engine
    * deliverable is the distributed READER above. */
  def writeIndexFlat(path: String, vectors: Seq[Array[Float]],
      innerProduct: Boolean = true): Unit = {
    require(vectors.nonEmpty, "empty matrix")
    val cols = vectors.head.length
    require(vectors.forall(_.length == cols), "ragged rows")
    val p = new Path(path)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val out = fs.create(p, true)
    try {
      val hdr = java.nio.ByteBuffer.allocate(HeaderLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      hdr.put((if (innerProduct) "IxFI" else "IxF2")
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      hdr.putInt(cols)
      hdr.putLong(vectors.length.toLong)
      hdr.putLong(1L << 20); hdr.putLong(1L << 20) // header dummies
      hdr.put(1.toByte) // is_trained
      hdr.putInt(if (innerProduct) 0 else 1) // metric_type
      hdr.putLong(vectors.length.toLong * cols * 4) // codes byte count
      out.write(hdr.array())
      val bb = java.nio.ByteBuffer.allocate(cols * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      vectors.foreach { row =>
        bb.clear()
        row.foreach(bb.putFloat)
        out.write(bb.array())
      }
    } finally out.close()
  }
}
