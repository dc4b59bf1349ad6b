package graft.fixtures

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

/** Synthetic HSDatalog2 acquisition-folder generator — the fixture
  * layer the reference lacks (SURVEY.md §5; spec FIXTURES.md §1).
  * Replaces the reference CI's cloud-only golden sample
  * (`.github/workflows/test-conversion.yml:89`) with deterministic
  * waveforms that have closed-form RMS:
  *
  *   x-axis: constant A        ⇒ RMS = A
  *   y-axis: sine, amplitude A ⇒ RMS = A/√2 (whole periods per window)
  *   z-axis: zeros             ⇒ RMS = 0
  *
  * Values are quantized to int16 via the configured sensitivity, so
  * expected RMS must be computed from the quantized amplitude.
  */
object AcquisitionFixture {

  val Sensitivity = 0.000488 // g/LSB, ±16 g IIS3DWB (FIXTURES.md §1.2)

  final case class Spec(
      alias: String = "LAF1",
      startTime: String = "2025-07-11T16:22:17.000Z",
      odr: Double = 26667.0,
      samplesPerTs: Int = 1000,
      seconds: Double = 3.5, // 3 whole seconds + a truncated tail
      amplitudeG: Double = 1.0,
      sineHz: Double = 50.0,
      ioffset: Double = 0.0,
      dataType: String = "int16") // int16 (quantized) or float32 (raw g/S)

  /** Raw int16 LSB value of the constant x amplitude after
    * quantization (round-half-even like numpy would). */
  def quantize(g: Double): Short =
    math.rint(g / Sensitivity).toShort

  /** Write `<dir>/{acquisition_info.json,device_config.json,iis3dwb_acc.dat}`.
    * Returns the number of complete framed blocks written. */
  def write(dir: String, spec: Spec = Spec()): Long = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    writeInfo(d, spec)
    writeDeviceConfig(d, spec)
    writeDat(d.resolve("iis3dwb_acc.dat"), spec)
  }

  /** Incomplete-acquisition fixture: omits device_config.json to
    * exercise the gate's soft-exit path (reference `main.py:43-47`). */
  def writeIncomplete(dir: String, spec: Spec = Spec()): Unit = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    writeInfo(d, spec)
    writeDat(d.resolve("iis3dwb_acc.dat"), spec)
  }

  private def writeInfo(d: Path, spec: Spec): Unit =
    Files.write(d.resolve("acquisition_info.json"),
      s"""{"uuid":"fixture-0001","name":"fixture",
         |"start_time":"${spec.startTime}","end_time":""}""".stripMargin
        .getBytes(StandardCharsets.UTF_8))

  private def writeDeviceConfig(d: Path, spec: Spec): Unit =
    Files.write(d.resolve("device_config.json"),
      s"""{"device":{"device_info":{"alias":"${spec.alias}"},"components":[
         |{"firmware_info":{"alias":"${spec.alias}","fw_name":"FP-SNS-DATALOG2","fw_version":"1.0.0"}},
         |{"iis3dwb_acc":{"enable":true,"odr":${spec.odr},"fs":16.0,"dim":3,
         |"data_type":"${spec.dataType}","samples_per_ts":${spec.samplesPerTs},
         |"ioffset":${spec.ioffset},"sensitivity":$Sensitivity,"sd_dps":6144}}]}}"""
        .stripMargin.getBytes(StandardCharsets.UTF_8))

  /** Stream the `.dat` to disk block by block (constant memory — the
    * same generator scales to the 1-hour/576 MB bench fixture). */
  def writeDat(file: Path, spec: Spec): Long = {
    val totalSamples = (spec.seconds * spec.odr).toLong
    val nBlocks = totalSamples / spec.samplesPerTs // trailing partial dropped
    val xRaw = quantize(spec.amplitudeG)
    val bps = spec.dataType match {
      case "int16" => 2
      case "float32" => 4
      case other => throw new IllegalArgumentException(s"fixture dtype $other")
    }
    // raw axis writers: int16 = half-even quantized LSBs; float32 =
    // g / sensitivity as float (scaling back at decode restores ~g)
    def putRaw(bb: ByteBuffer, g: Double): Unit = spec.dataType match {
      case "int16" => bb.putShort(quantize(g))
      case "float32" => bb.putFloat((g / Sensitivity).toFloat)
    }
    val out = new BufferedOutputStream(new FileOutputStream(file.toFile), 1 << 20)
    try {
      val bb = ByteBuffer
        .allocate(spec.samplesPerTs * 3 * bps + 8)
        .order(ByteOrder.LITTLE_ENDIAN)
      var sample = 0L
      var b = 0L
      while (b < nBlocks) {
        bb.clear()
        var i = 0
        while (i < spec.samplesPerTs) {
          // sample j (1-based) sits at ioffset + j/odr — the decoder's
          // interpolation (FIXTURES.md §1.3: block timestamp = time of
          // LAST sample; first block anchored at ioffset) then
          // reproduces these times exactly
          sample += 1
          val t = spec.ioffset + sample.toDouble / spec.odr
          val y = spec.amplitudeG * math.sin(2 * math.Pi * spec.sineHz * t)
          if (spec.dataType == "int16") bb.putShort(xRaw)
          else putRaw(bb, spec.amplitudeG)
          putRaw(bb, y)
          putRaw(bb, 0.0)
          i += 1
        }
        // block-end timestamp = time of the block's LAST sample
        bb.putDouble(spec.ioffset + sample.toDouble / spec.odr)
        out.write(bb.array(), 0, bb.position())
        b += 1
      }
      // deliberately truncated trailing partial block (completeness
      // predicate + decode-carryover coverage)
      val rem = (totalSamples % spec.samplesPerTs).toInt
      if (rem > 0) {
        bb.clear()
        var i = 0
        while (i < rem) {
          if (spec.dataType == "int16") bb.putShort(xRaw)
          else putRaw(bb, spec.amplitudeG)
          putRaw(bb, 0.0); putRaw(bb, 0.0)
          i += 1
        }
        out.write(bb.array(), 0, bb.position())
      }
      nBlocks
    } finally out.close()
  }
}
