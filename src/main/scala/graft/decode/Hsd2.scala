package graft.decode

import java.nio.{ByteBuffer, ByteOrder}

import graft.model.ComponentConfig

/** HSD2 `.dat` block framer + sample decoder — pure Scala, no Spark.
  *
  * Layout (normative spec in FIXTURES.md §1.3; framing per the
  * reference dtk wheel `stdatalog_dtk/HSD_DataToolkit.py:46-66`):
  *
  * {{{
  * repeat:
  *   data block : samples_per_ts × dim × sizeof(data_type) bytes,
  *                little-endian, sample-major (x0,y0,z0,x1,y1,z1,…)
  *   timestamp  : 8-byte little-endian IEEE-754 double ('<d'),
  *                seconds since acquisition start,
  *                = time of the LAST sample in the block
  * }}}
  *
  * Per-sample physical value = raw × sensitivity (reference decode is
  * called with raw_data=False, `main.py:78`). Per-sample relative time
  * is linearly interpolated from the block-end timestamps: within a
  * block whose previous-block timestamp (or `ioffset` for the first
  * block) is `t0` and own timestamp is `t1`, sample i of n sits at
  * `t0 + (i+1)·(t1−t0)/n` — so the last sample lands exactly on `t1`.
  *
  * Trailing bytes that do not form a complete packet are ignored
  * (the dtk accumulates partial packets for the next push — for a
  * closed file there is no next push).
  */
object Hsd2 {

  /** One decoded multi-axis sample: relative time (s) + one physical
    * value per axis. */
  final case class Sample(time: Double, values: Array[Double])

  /** Number of complete (data + timestamp) packets in `totalBytes`. */
  def completeBlocks(totalBytes: Long, cfg: ComponentConfig): Long =
    totalBytes / cfg.blockBytes

  /** Absolute-position raw-sample reader for a dtype — the ONE
    * dispatch point shared by the framed decode, the unframed decode
    * and the DSv2 reader, so the supported type sets cannot drift
    * (dtype space per the reference dtk's TypeConversion,
    * `HSD_DataToolkit.py:47-48`). Resolved once per task, outside
    * the per-sample loop. */
  def rawReader(dataType: String): (ByteBuffer, Int) => Double = dataType match {
    case "int16" => (bb, p) => bb.getShort(p).toDouble
    case "uint16" => (bb, p) => (bb.getShort(p) & 0xffff).toDouble
    case "int8" => (bb, p) => bb.get(p).toDouble
    case "uint8" => (bb, p) => (bb.get(p) & 0xff).toDouble
    case "int32" => (bb, p) => bb.getInt(p).toDouble
    case "uint32" => (bb, p) => (bb.getInt(p).toLong & 0xffffffffL).toDouble
    case "float" | "float32" => (bb, p) => bb.getFloat(p).toDouble
    case "double" | "float64" => (bb, p) => bb.getDouble(p)
    case other => throw new IllegalArgumentException(s"data_type $other")
  }

  /** Decode `nBlocks` packets from `bytes` (which must start on a
    * packet boundary).
    *
    * @param anchor relative time the block's interpolation starts
    *               from: `ioffset` for the file's first block, the
    *               previous block's embedded timestamp otherwise.
    */
  def decodeBlocks(
      bytes: Array[Byte],
      cfg: ComponentConfig,
      nBlocks: Int,
      anchor: Double): Iterator[Sample] = {
    require(cfg.samplesPerTs > 0, "samples_per_ts must be > 0 for framed decode")
    val spts = cfg.samplesPerTs
    val dim = cfg.dim
    val bps = cfg.bytesPerSample
    val reader = rawReader(cfg.dataType)
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)

    new Iterator[Sample] {
      private var block = 0
      private var i = 0
      private var t0 = anchor
      private var t1 = 0.0
      private var haveBlock = false

      private def loadBlock(): Unit = {
        // peek the block-end timestamp before iterating samples
        val tsPos = bb.position() + cfg.dataBytesPerBlock
        t1 = bb.getDouble(tsPos)
        haveBlock = true
      }

      override def hasNext: Boolean = block < nBlocks
      override def next(): Sample = {
        if (!haveBlock) loadBlock()
        val vals = new Array[Double](dim)
        var d = 0
        while (d < dim) {
          vals(d) = readRaw() * cfg.sensitivity
          d += 1
        }
        // last sample sits EXACTLY on the block timestamp (the spec's
        // defining property); interpolation arithmetic alone can land
        // 1 ulp off (t0 + n·(t1−t0)/n ≠ t1 in floating point)
        val t =
          if (i == spts - 1) t1
          else t0 + (i + 1).toDouble * (t1 - t0) / spts.toDouble
        i += 1
        if (i == spts) {
          bb.position(bb.position() + 8) // consume the timestamp
          t0 = t1
          i = 0
          block += 1
          haveBlock = false
        }
        Sample(t, vals)
      }

      private def readRaw(): Double = {
        val v = reader(bb, bb.position())
        bb.position(bb.position() + bps)
        v
      }
    }
  }

  /** Decode an unframed stream (samples_per_ts == 0: no embedded
    * timestamps); time axis synthesized from the output data rate. */
  def decodeUnframed(bytes: Array[Byte], cfg: ComponentConfig): Iterator[Sample] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val bps = cfg.bytesPerSample
    val n = bytes.length / (cfg.dim * bps)
    val dim = cfg.dim
    val reader = rawReader(cfg.dataType)
    Iterator.tabulate(n) { i =>
      val vals = new Array[Double](dim)
      var d = 0
      while (d < dim) {
        vals(d) = reader(bb, (i * dim + d) * bps) * cfg.sensitivity
        d += 1
      }
      Sample(cfg.ioffset + i.toDouble / cfg.odr, vals)
    }
  }

  /** Decode-output column names, pre-sanitization — the shape the
    * reference's core decode emits for an accelerometer (FIXTURES.md
    * §1.4): `Time, A_x [g], A_y [g], A_z [g]`. Other dims fall back
    * to generic axis names. */
  def rawColumnNames(cfg: ComponentConfig): Seq[String] =
    if (cfg.dim == 3) Seq("A_x [g]", "A_y [g]", "A_z [g]")
    else (0 until cfg.dim).map(i => s"${cfg.name}_$i")
}
