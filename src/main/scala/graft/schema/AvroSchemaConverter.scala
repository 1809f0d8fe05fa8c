package graft.schema

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro-JSON record schema → Spark [[StructType]].
  *
  * Capability parity with the reference's `avro_schema_to_spark_schema`
  * (reference: scripts/bronze-silver.py:22-57): primitive types, the
  * `timestamp-micros` and `date` logical types, `["null", T]` nullable
  * unions, and a StringType fallback for anything unrecognized.
  *
  * Pure driver-side function — schemas are tiny; no Spark involvement.
  */
object AvroSchemaConverter {

  private val mapper = new ObjectMapper()

  /** Parse an Avro record schema (JSON string) into a StructType. */
  def toStructType(avroJson: String): StructType = {
    val root = mapper.readTree(avroJson)
    require(root.path("type").asText() == "record",
      s"top-level Avro schema must be a record, got: ${root.path("type")}")
    val fields = root.path("fields").elements().asScala.map { f =>
      val (dt, nullable) = convertType(f.path("type"))
      StructField(f.path("name").asText(), dt, nullable)
    }.toArray
    StructType(fields)
  }

  /** (DataType, nullable) for one Avro type node. */
  private def convertType(t: JsonNode): (DataType, Boolean) = {
    if (t.isTextual) (primitive(t.asText()), false)
    else if (t.isArray) {
      // union: nullable iff "null" is a branch; use the first non-null branch
      val branches = t.elements().asScala.toSeq
      val nullable = branches.exists(b => b.isTextual && b.asText() == "null")
      val nonNull = branches.find(b => !(b.isTextual && b.asText() == "null"))
      nonNull match {
        case Some(b) => (convertType(b)._1, nullable)
        case None    => (NullType, true)
      }
    } else if (t.isObject) {
      val logical = t.path("logicalType").asText("")
      logical match {
        case "timestamp-micros" | "timestamp-millis" => (TimestampType, false)
        case "date"                                  => (DateType, false)
        case _ => (primitive(t.path("type").asText("")), false)
      }
    } else (StringType, false)
  }

  private def primitive(name: String): DataType = name match {
    case "string"  => StringType
    case "int"     => IntegerType
    case "long"    => LongType
    case "float"   => FloatType
    case "double"  => DoubleType
    case "boolean" => BooleanType
    case "bytes"   => BinaryType
    case _         => StringType // fallback, mirrors the reference's behavior
  }
}
