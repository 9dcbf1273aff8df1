package graft.etl

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.kafsql.SchemaCol

/** Sink columns derived from a JSON-Schema document — the reference's
  * registry-driven schema source (`sink/iceberg.go:795-828`
  * `columnsFromSchemaBytes`, `:763-793` type mapping): each top-level
  * `properties` entry becomes a column extracted from the record value at
  * `$.name`, with JSON-Schema types mapped
  * integer→long, number→double, boolean→boolean, string→string;
  * union types (`["null","string"]`) take their first non-null member;
  * properties with unmappable types (object, array) are SKIPPED, not
  * errors. Columns sort by name (iceberg.go:822-825) and the document's
  * `required` list drives validation: only required columns must extract
  * non-null for a record to be valid (schema/schema.go semantics), unlike
  * caller-supplied columns which are all treated as required.
  *
  * The registry FETCH (HTTP subject lookup, `iceberg.go:727-761`) is the
  * caller's concern — this module owns the document → columns derivation,
  * so a test or an embedding can feed documents from anywhere.
  */
object SchemaRegistry {

  final class SchemaDocException(msg: String) extends RuntimeException(msg)

  /** `mapJSONType` (iceberg.go:779-793). */
  def mapJsonType(t: String): Option[String] = t.toLowerCase match {
    case "integer" => Some("long")
    case "number" => Some("double")
    case "boolean" => Some("boolean")
    case "string" => Some("string")
    case _ => None
  }

  /** `jsonSchemaType` (iceberg.go:763-777): a `type` that is a string, or
    * the first non-"null" member of a type array. */
  private def typeOf(prop: JsonNode): String = {
    val t = prop.path("type")
    if (t.isTextual) t.asText()
    else if (t.isArray)
      t.elements().asScala.map(_.asText()).find(_ != "null").getOrElse("")
    else ""
  }

  /** Derive (columns sorted by name, required column names) from a
    * JSON-Schema document. Malformed JSON throws; a document without
    * `properties` yields no columns (matching the reference's nil-props
    * tolerance). */
  def columnsFromJsonSchema(json: String): (Seq[SchemaCol], Set[String]) = {
    val node =
      try new ObjectMapper().readTree(json)
      catch { case e: Exception =>
        throw new SchemaDocException(s"invalid schema document: ${e.getMessage}")
      }
    if (node == null) throw new SchemaDocException("empty schema document")
    val required = node.path("required") match {
      case a if a.isArray => a.elements().asScala.map(_.asText()).toSet
      case _ => Set.empty[String]
    }
    val cols = node.path("properties") match {
      case p if p.isObject =>
        p.properties().asScala.toSeq.flatMap { e =>
          mapJsonType(typeOf(e.getValue))
            .map(m => SchemaCol(e.getKey, m, s"$$.${e.getKey}"))
        }
      case _ => Nil
    }
    val sorted = cols.sortBy(_.name)
    (sorted, required.intersect(sorted.map(_.name).toSet))
  }
}
