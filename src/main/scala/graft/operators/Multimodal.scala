package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition (SURVEY.md
  * §7.1 ext).
  *
  * The Spark-side plumbing — schema, batch shape, partition-parallel
  * decode, frame explode — is real and tested. The actual codec is
  * STUBBED behind a deterministic fake container format (`GRFT`
  * header), because no image/audio libraries ship in this
  * environment; swapping [[decodeMeta]]'s parser for a real codec
  * changes no plan shape.
  *
  * Fake container layout (little-endian):
  * {{{
  *   magic   : 4 bytes "GRFT"
  *   mtype   : 1 byte  (0=image, 1=audio, 2=video)
  *   width   : int32   (image/video) | sample_rate (audio)
  *   height  : int32   (image/video) | channels    (audio)
  *   nframes : int32   (1 for image)
  *   payload : width·height bytes per frame (pixel/PCM stand-in)
  * }}}
  */
object Multimodal {

  val Magic: Array[Byte] = "GRFT".getBytes("ASCII")

  val metaSchema: StructType = StructType(Seq(
    StructField("mtype", StringType, true),
    StructField("width", IntegerType, true),
    StructField("height", IntegerType, true),
    StructField("nframes", IntegerType, true),
    StructField("payload_bytes", IntegerType, true),
    StructField("valid", BooleanType, false)))

  /** Deterministic fake encoder (fixture side). */
  def encode(mtype: Int, width: Int, height: Int, nframes: Int, seed: Long): Array[Byte] = {
    val payload = width * height * nframes
    val bb = ByteBuffer.allocate(4 + 1 + 12 + payload).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(Magic).put(mtype.toByte).putInt(width).putInt(height).putInt(nframes)
    var i = 0
    var x = seed
    while (i < payload) { // xorshift noise — deterministic "pixels"
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      bb.put((x & 0xff).toByte)
      i += 1
    }
    bb.array()
  }

  private def parseHeader(bytes: Array[Byte]): Row = {
    if (bytes == null || bytes.length < 17 ||
        bytes(0) != 'G' || bytes(1) != 'R' || bytes(2) != 'F' || bytes(3) != 'T')
      Row(null, null, null, null, null, false)
    else {
      val bb = ByteBuffer.wrap(bytes, 4, 13).order(ByteOrder.LITTLE_ENDIAN)
      val mtype = bb.get() match {
        case 0 => "image"
        case 1 => "audio"
        case 2 => "video"
        case _ => "unknown"
      }
      val w = bb.getInt; val h = bb.getInt; val nf = bb.getInt
      // a truncated payload must flag invalid, not crash downstream
      // pixel/frame readers with out-of-bounds access
      val declared = w.toLong * h.toLong * math.max(nf, 1).toLong
      val ok = w > 0 && h > 0 && nf > 0 &&
        declared <= bytes.length.toLong - 17
      Row(mtype, w, h, nf, bytes.length - 17, ok)
    }
  }

  /** Header decode: binary column → typed metadata struct. Runs as a
    * per-partition map over the binary payloads (the shape a real
    * codec needs: whole blob visible to one task, no shuffle). */
  def decodeMeta(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(
      StructField("id", LongType, false) +: metaSchema.fields.toIndexedSeq)
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.map { r =>
        val meta = parseHeader(r.getAs[Array[Byte]](1))
        Row.fromSeq(r.getLong(0) +: meta.toSeq)
      })
    spark.createDataFrame(rows, outSchema)
  }

  /** Feature extraction STUB: per-blob byte statistics stand in for
    * a real embedding/feature model; the distribution shape (one
    * dense vector per blob, partition-parallel) is the real contract. */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("mean_byte", DoubleType, true),
      StructField("min_byte", IntegerType, true),
      StructField("max_byte", IntegerType, true)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.map { r =>
        val b = r.getAs[Array[Byte]](1)
        if (b == null || b.length <= 17) Row(r.getLong(0), null, null, null)
        else {
          var s = 0L; var mn = 255; var mx = 0; var i = 17
          while (i < b.length) {
            val v = b(i) & 0xff
            s += v; if (v < mn) mn = v; if (v > mx) mx = v
            i += 1
          }
          Row(r.getLong(0), s.toDouble / (b.length - 17), mn, mx)
        }
      })
    spark.createDataFrame(rows, schema)
  }

  /** Resize STUB: nearest-neighbor downsample of each image-like
    * blob's pixel grid to (outW × outH), re-encoded in the same fake
    * container — deterministic; swapping in a real scaler changes no
    * plan shape. Non-image/invalid blobs pass through null. */
  def resize(df: DataFrame, idCol: String, binCol: String,
      outW: Int, outH: Int): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("resized", BinaryType, true)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.map { r =>
        val b = r.getAs[Array[Byte]](1)
        val meta = parseHeader(b)
        if (!meta.getBoolean(5) || meta.getString(0) != "image")
          Row(r.getLong(0), null)
        else {
          val w = meta.getInt(1); val h = meta.getInt(2)
          val out = ByteBuffer.allocate(17 + outW * outH)
            .order(ByteOrder.LITTLE_ENDIAN)
          out.put(Magic).put(0.toByte).putInt(outW).putInt(outH).putInt(1)
          var y = 0
          while (y < outH) {
            val sy = y * h / outH
            var x = 0
            while (x < outW) {
              val sx = x * w / outW
              out.put(b(17 + sy * w + sx))
              x += 1
            }
            y += 1
          }
          Row(r.getLong(0), out.array())
        }
      })
    spark.createDataFrame(rows, schema)
  }

  /** Frame sampling for video-like blobs: every `stride`-th frame as
    * its own row (id, frame_idx, frame binary). The explode runs
    * inside the partition — no shuffle, output size bounded by
    * payload/stride. */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String, stride: Int): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType, false),
      StructField("frame_idx", IntegerType, false),
      StructField("frame", BinaryType, true)))
    val rows = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions(_.flatMap { r =>
        val b = r.getAs[Array[Byte]](1)
        val meta = parseHeader(b)
        if (!meta.getBoolean(5)) Iterator.empty
        else {
          val w = meta.getInt(1); val h = meta.getInt(2); val nf = meta.getInt(3)
          val frameBytes = w * h
          (0 until nf by stride).iterator.map { f =>
            val frame = java.util.Arrays.copyOfRange(b, 17 + f * frameBytes,
              math.min(17 + (f + 1) * frameBytes, b.length))
            Row(r.getLong(0), f, frame)
          }
        }
      })
    spark.createDataFrame(rows, schema)
  }

  /** Deterministic fixture table: mixed image/audio/video blobs. */
  def fixture(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val mtype = i % 3
      val bytes = mtype match {
        case 0 => encode(0, 8 + i % 5, 6 + i % 4, 1, seed = 1000 + i)
        case 1 => encode(1, 16000, 2, 1, seed = 1000 + i) // 32 kB "PCM"
        case 2 => encode(2, 8, 8, 4 + i % 3, seed = 1000 + i)
      }
      Row(i.toLong, bytes)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("media", BinaryType, true))))
  }
}
