package graft.model

import java.time.{Instant, OffsetDateTime}

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Acquisition metadata model — the subset of the reference's JSON
  * config surface that drives the pipeline (SURVEY.md §1.1).
  *
  * An acquisition is a folder holding `acquisition_info.json`,
  * `device_config.json` and one `.dat` per sensor component
  * (reference `main.py:16-21`). The decode schema is config-driven,
  * never inferred from data (reference `main.py:74-81`; DTDL component
  * properties in the pnpl wheel's device templates).
  */
final case class AcquisitionInfo(
    uuid: String,
    name: String,
    /** ISO-8601 with Z suffix (reference `main.py:68-69`); epoch when absent. */
    startTime: Instant,
    /** Tag toggle events from the `tags` array (public HSDatalog2
      * acquisition_info shape: `{"l": label, "e": enable, "ta": iso
      * time}`) — the data behind `labeled=True` conversions and the
      * pipeline `tag_cb`. Empty when absent (the reference runs
      * `labeled=False`). */
    tags: Seq[TagToggle] = Nil)

/** One tag toggle: `label` switched to `enable` at epoch-ns `ts`. */
final case class TagToggle(label: String, enable: Boolean, ts: Long)

object AcquisitionInfo {
  val DefaultStart: Instant = Instant.EPOCH

  private def parseIso(s: String): Instant =
    OffsetDateTime.parse(s.replace("Z", "+00:00")).toInstant

  def fromJson(json: String): AcquisitionInfo = {
    val j = JsonMethods.parse(json)
    def str(field: String): Option[String] = j \ field match {
      case JString(s) => Some(s)
      case _ => None
    }
    val tags = j \ "tags" match {
      case JArray(items) => items.flatMap { t =>
        (t \ "l", t \ "e", t \ "ta") match {
          case (JString(l), JBool(e), JString(ta)) =>
            scala.util.Try(TagToggle(l, e, epochNanos(parseIso(ta)))).toOption
          case _ => None
        }
      }
      case _ => Nil
    }
    AcquisitionInfo(
      uuid = str("uuid").getOrElse(""),
      name = str("name").getOrElse(""),
      startTime = str("start_time")
        // reference accepts "...Z"; replace matches main.py:69
        .map(parseIso)
        .getOrElse(DefaultStart),
      tags = tags)
  }

  /** Epoch nanoseconds of the acquisition start — the additive term of
    * the time-normalization operator (reference `main.py:100-102`).
    * Computed on the driver once; a foldable literal in the plan. */
  def epochNanos(i: Instant): Long =
    i.getEpochSecond * 1000000000L + i.getNano
}

/** One sensor component's decode-driving status (reference: the
  * `iis3dwb_acc` component of device_config.json, validated against
  * the DTDL template `…sensors:iis3dwb_acc;6` — properties odr, fs,
  * enable, samples_per_ts, dim, ioffset, sensitivity, data_type). */
final case class ComponentConfig(
    name: String,
    enabled: Boolean,
    odr: Double,
    dim: Int,
    dataType: String,
    samplesPerTs: Int,
    ioffset: Double,
    sensitivity: Double) {

  def bytesPerSample: Int = dataType match {
    case "int16" | "uint16" => 2
    case "int8" | "uint8" => 1
    case "int32" | "uint32" | "float" | "float32" => 4
    case "double" | "float64" => 8
    case other => throw new IllegalArgumentException(s"unsupported data_type $other")
  }

  /** Bytes of one framed packet: data block + 8-byte `<d` timestamp
    * (framing math per the reference dtk wheel, HSD_DataToolkit.py:46-51). */
  def dataBytesPerBlock: Int = samplesPerTs * dim * bytesPerSample
  def blockBytes: Int = dataBytesPerBlock + (if (samplesPerTs != 0) 8 else 0)
}

final case class DeviceConfig(
    alias: String,
    components: Map[String, ComponentConfig])

object DeviceConfig {
  /** Parse device_config.json: `device.device_info` / per-element
    * `firmware_info.alias` feeds the alias literal (reference
    * `main.py:71-72`, default "unknown"); each other keyed component
    * object is a sensor status. */
  def fromJson(json: String): DeviceConfig = {
    val j = JsonMethods.parse(json)
    val comps = j \ "device" \ "components" match {
      case JArray(items) => items
      case _ => Nil
    }
    def optD(v: JValue): Option[Double] = v match {
      case JDouble(d) => Some(d)
      case JInt(i) => Some(i.toDouble)
      case JLong(l) => Some(l.toDouble)
      case JDecimal(d) => Some(d.toDouble)
      case _ => None
    }
    val alias = comps.iterator
      .map(c => c \ "firmware_info" \ "alias")
      .collectFirst { case JString(a) => a }
      .getOrElse("unknown")
    val sensors = comps.iterator.flatMap {
      case JObject(fields) =>
        fields.collect {
          case (name, body: JObject) if name != "firmware_info" &&
              (body \ "dim") != JNothing =>
            name -> ComponentConfig(
              name = name,
              enabled = (body \ "enable") match {
                case JBool(b) => b
                case _ => true
              },
              odr = optD(body \ "odr").getOrElse(0.0),
              dim = optD(body \ "dim").map(_.toInt).getOrElse(1),
              dataType = (body \ "data_type") match {
                case JString(s) => s
                case _ => "int16"
              },
              samplesPerTs = optD(body \ "samples_per_ts").map(_.toInt).getOrElse(0),
              ioffset = optD(body \ "ioffset").getOrElse(0.0),
              sensitivity = optD(body \ "sensitivity").getOrElse(1.0))
        }
      case _ => Nil
    }.toMap
    DeviceConfig(alias, sensors)
  }
}

/** Column-name sanitizer — the reference rename lambda
  * (`main.py:87-96`) applied in ITS order: space→`_`, strip `[`/`]`,
  * drop unit forms `(g)`/`{g}`/`/g` entirely (empty string, not "g"),
  * `°`→`deg`, `,`→`_`. E.g. `A_x [g]` → `A_x_g` (bracket strip keeps
  * the g), `Gyro (g)` → `Gyro_`, `Temp [°C]` → `Temp_degC`. */
object Sanitize {
  def column(c: String): String =
    c.replace(" ", "_")
      .replace("[", "")
      .replace("]", "")
      .replace("(g)", "")
      .replace("{g}", "")
      .replace("/g", "")
      .replace("°", "deg")
      .replace(",", "_")
}
