package graft.schema

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class AvroSchemaConverterSpec extends AnyFunSuite {

  test("primitives, logical types, nullable unions, fallback") {
    val avro =
      """{"type":"record","name":"r","fields":[
        |{"name":"s","type":"string"},
        |{"name":"i","type":"int"},
        |{"name":"l","type":"long"},
        |{"name":"f","type":"float"},
        |{"name":"d","type":"double"},
        |{"name":"b","type":"boolean"},
        |{"name":"ts","type":{"type":"long","logicalType":"timestamp-micros"}},
        |{"name":"dt","type":{"type":"int","logicalType":"date"}},
        |{"name":"ns","type":["null","string"]},
        |{"name":"weird","type":"fixed16"}
        |]}""".stripMargin
    val st = AvroSchemaConverter.toStructType(avro)
    assert(st("s").dataType == StringType && !st("s").nullable)
    assert(st("i").dataType == IntegerType)
    assert(st("l").dataType == LongType)
    assert(st("f").dataType == FloatType)
    assert(st("d").dataType == DoubleType)
    assert(st("b").dataType == BooleanType)
    assert(st("ts").dataType == TimestampType)
    assert(st("dt").dataType == DateType)
    assert(st("ns").dataType == StringType && st("ns").nullable)
    assert(st("weird").dataType == StringType) // fallback
  }

  test("reference orders schema converts to the documented silver schema") {
    val st = AvroSchemaConverter.toStructType(
      graft.pipeline.BronzeToSilverJob.ordersAvroSchema)
    assert(st.fieldNames.toSeq == Seq("replicadmstimestamp", "invoiceid",
      "itemid", "category", "price", "quantity", "orderdate",
      "destinationstate", "shippingtype", "referral"))
    assert(st("replicadmstimestamp").dataType == TimestampType)
    assert(st("orderdate").dataType == DateType)
    assert(st("quantity").dataType == IntegerType)
  }
}
