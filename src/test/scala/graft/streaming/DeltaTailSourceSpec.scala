package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.lake.{DeltaExport, LakeTable}

/** Tailing a FOREIGN Delta log as a stream (format("delta-tail")):
  * offsets are Delta versions, batches are incremental version-range
  * reads — exactly-once across triggers and restarts, rate-limitable,
  * loud on non-append-only versions. */
class DeltaTailSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stream tails published Delta versions exactly once; restart " +
      "reads only the delta; rate limit splits the backlog") {
    val base = TestSpark.tmpDir("deltatail")
    val t = LakeTable.create(spark, s"$base/t",
      Seq((1L, "a")).toDF("id", "v").schema)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    DeltaExport.export(t, s"$base/delta")            // v0
    t.append(Seq((3L, "c")).toDF("id", "v"))
    DeltaExport.publish(t, s"$base/delta")           // v1

    def drain(max: Option[Int] = None): Unit = {
      var r = spark.readStream.format("delta-tail").load(s"$base/delta")
      max.foreach(n => r = spark.readStream.format("delta-tail")
        .option("maxVersionsPerTrigger", n.toString)
        .load(s"$base/delta"))
      val q = r.writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def sunk(): Set[(Long, String)] =
      spark.read.parquet(s"$base/out").as[(Long, String)].collect().toSet

    drain(max = Some(1)) // backlog of 2 versions drains in capped steps
    assert(sunk() == Set((1L, "a"), (2L, "b"), (3L, "c")))

    // new publishes; restart from the SAME checkpoint reads the delta
    t.append(Seq((4L, "d")).toDF("id", "v"))
    DeltaExport.publish(t, s"$base/delta")           // v2
    drain()
    assert(sunk() == Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    // no new versions: another drain adds nothing
    drain()
    assert(sunk().size == 4)
  }

  test("delta-tail into a graft lake sink: foreign-log -> governed " +
      "table replication, exactly-once end to end") {
    val base = TestSpark.tmpDir("deltatail-lake")
    val src = LakeTable.create(spark, s"$base/src",
      Seq((1L, 1.0)).toDF("id", "v").schema)
    src.append(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"))
    DeltaExport.export(src, s"$base/delta")
    src.append(Seq((3L, 3.0)).toDF("id", "v"))
    DeltaExport.publish(src, s"$base/delta")
    val dst = LakeTable.create(spark, s"$base/dst",
      Seq((1L, 1.0)).toDF("id", "v").schema)
    val q = spark.readStream.format("delta-tail").load(s"$base/delta")
      .writeStream.format("graft-lake")
      .option("path", s"$base/dst")
      .option("txnAppId", "dtail")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(dst.scan().collect().map(_.toSeq).toSet ==
      src.scan().collect().map(_.toSeq).toSet)
  }

  test("a removing version fails the stream loudly (append-only " +
      "contract, same as the batch incremental read)") {
    val base = TestSpark.tmpDir("deltatail-rm")
    val t = LakeTable.create(spark, s"$base/t",
      Seq((1L, "a")).toDF("id", "v").schema)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    DeltaExport.export(t, s"$base/delta")
    t.delete(col("id") === 1L)
    DeltaExport.publish(t, s"$base/delta")           // v1 removes
    val q = spark.readStream.format("delta-tail").load(s"$base/delta")
      .writeStream.format("parquet").option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    val e = intercept[org.apache.spark.sql.streaming
      .StreamingQueryException] { q.awaitTermination() }
    assert(e.getMessage.contains("append-only") ||
      Option(e.getCause).exists(_.getMessage.contains("append-only")))
  }
}
