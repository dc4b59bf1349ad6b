package graft.model

import org.json4s._
import org.json4s.jackson.JsonMethods

import org.apache.spark.sql.types._

/** DTDL device-template subset (O22): the schema/metadata system of
  * the reference's pnpl wheel — root interface → component list →
  * per-component property schemas — mapped onto Spark `StructType`.
  *
  * Coverage mirrors what the reference actually consumes
  * (`pnpl!DTDL/device_template_manager.py:34-51,138-198` and
  * `device_template_model.py:106-114`): scalar schemas
  * boolean/double/integer/string, complex schemas Enum (integer
  * value) and Object (nested fields), catalog lookup by
  * (board_id, fw_id) with custom-template precedence.
  */
object Dtdl {

  final case class Property(name: String, dataType: DataType, writable: Boolean)
  final case class Component(name: String, id: String, properties: Seq[Property])
  final case class Template(id: String, components: Map[String, Component])

  private def schemaToType(schema: JValue): DataType = schema match {
    case JString("boolean") => BooleanType
    case JString("double") => DoubleType
    case JString("integer") => IntegerType
    case JString("string") => StringType
    case obj: JObject => (obj \ "@type") match {
      case JString("Enum") => IntegerType // enum value transits as its ordinal
      case JString("Object") =>
        val fields = (obj \ "fields") match {
          case JArray(fs) => fs.map { f =>
            StructField(str(f \ "name").getOrElse(""), schemaToType(f \ "schema"))
          }
          case _ => Nil
        }
        StructType(fields)
      case _ => StringType
    }
    case _ => StringType
  }

  private def str(v: JValue): Option[String] = v match {
    case JString(s) => Some(s)
    case _ => None
  }

  /** Parse a DTDL document (a JSON array of interfaces): the root
    * interface is the one whose contents include Components; each
    * referenced component interface contributes its Property
    * contents. */
  def parseTemplate(json: String): Template = {
    val docs = JsonMethods.parse(json) match {
      case JArray(items) => items
      case single => List(single)
    }
    val byId = docs.flatMap(d => str(d \ "@id").map(_ -> d)).toMap
    def contents(d: JValue): List[JValue] = (d \ "contents") match {
      case JArray(items) => items
      case _ => Nil
    }
    def isType(c: JValue, t: String): Boolean = (c \ "@type") match {
      case JString(s) => s == t
      case JArray(items) => items.contains(JString(t))
      case _ => false
    }
    val root = docs.find(d => contents(d).exists(isType(_, "Component")))
      .getOrElse(throw new IllegalArgumentException("no root interface with Components"))
    val comps = contents(root).filter(isType(_, "Component")).flatMap { c =>
      for {
        name <- str(c \ "name")
        schemaId <- str(c \ "schema")
        compDoc <- byId.get(schemaId)
      } yield {
        val props = contents(compDoc).filter(isType(_, "Property")).map { p =>
          Property(
            str(p \ "name").getOrElse(""),
            schemaToType(p \ "schema"),
            writable = (p \ "writable") == JBool(true))
        }
        name -> Component(name, schemaId, props)
      }
    }
    Template(str(root \ "@id").getOrElse(""), comps.toMap)
  }

  /** Component property schema as a Spark StructType — the bridge
    * from the device's self-description to a typed DataFrame. */
  def toStructType(c: Component): StructType =
    StructType(c.properties.map(p => StructField(p.name, p.dataType)))

  /** Catalog lookup by (board_id, fw_id) with the reference's
    * precedence: custom templates win over the built-in catalog. */
  final case class CatalogEntry(boardId: String, fwId: String, template: Template)

  final class Catalog(builtin: Seq[CatalogEntry], custom: Seq[CatalogEntry]) {
    def lookup(boardId: String, fwId: String): Option[Template] = {
      def find(es: Seq[CatalogEntry]) = es.find(e =>
        e.boardId.equalsIgnoreCase(boardId) && e.fwId.equalsIgnoreCase(fwId))
      find(custom).orElse(find(builtin)).map(_.template)
    }
  }
}
