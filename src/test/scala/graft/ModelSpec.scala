package graft

import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{AcquisitionInfo, DeviceConfig, Sanitize}

class ModelSpec extends AnyFunSuite {

  test("acquisition_info: ISO-8601 Z parse + epoch-ns (main.py:68-69,100)") {
    val a = AcquisitionInfo.fromJson(
      """{"uuid":"u","name":"n","start_time":"2025-07-11T16:22:17.000Z"}""")
    assert(a.startTime == Instant.parse("2025-07-11T16:22:17Z"))
    assert(AcquisitionInfo.epochNanos(a.startTime) == 1752250937000000000L)
  }

  test("acquisition_info: missing start_time defaults to epoch") {
    val a = AcquisitionInfo.fromJson("""{"uuid":"u"}""")
    assert(a.startTime == Instant.EPOCH)
  }

  test("device_config: alias + component status (main.py:71-74)") {
    val d = DeviceConfig.fromJson(
      """{"device":{"device_info":{"alias":"X"},"components":[
        |{"firmware_info":{"alias":"LAF1","fw_name":"f","fw_version":"1"}},
        |{"iis3dwb_acc":{"enable":true,"odr":26667.0,"fs":16.0,"dim":3,
        |  "data_type":"int16","samples_per_ts":1000,"ioffset":0.0,
        |  "sensitivity":0.000488}}]}}""".stripMargin)
    assert(d.alias == "LAF1") // firmware_info wins (main.py:71-72)
    val c = d.components("iis3dwb_acc")
    assert(c.dim == 3 && c.samplesPerTs == 1000 && c.dataType == "int16")
    assert(c.blockBytes == 1000 * 3 * 2 + 8)
  }

  test("device_config: missing firmware alias defaults to unknown") {
    val d = DeviceConfig.fromJson("""{"device":{"components":[]}}""")
    assert(d.alias == "unknown")
  }

  test("column sanitizer (main.py:87-96)") {
    assert(Sanitize.column("A_x [g]") == "A_x_g")
    assert(Sanitize.column("Temp [°C]") == "Temp_degC")
    // reference drops the (g)/{g}//g unit forms entirely (replace
    // with "", main.py:90-93) — trailing underscore and all
    assert(Sanitize.column("Gyro (g)") == "Gyro_")
    assert(Sanitize.column("{g}x/g") == "x")
    assert(Sanitize.column("a,b/g") == "a_b")
  }
}
