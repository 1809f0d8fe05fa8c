package graft.lake

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** A filter on the partition column of a lake-table scan must become a
  * Catalyst PartitionFilter and skip the other partitions' files — the
  * property that makes `WHERE destinationstate = 'CA'` read 1/57th of
  * silver at 100 TB. */
class PartitionPruningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("partition-column filter prunes files at planning time") {
    val root = TestSpark.tmpDir("prune") + "/t"
    val df = Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z"))
      .toDF("id", "v", "p")
    val t = LakeTable.create(spark, root, df.schema, Seq("p"))
    t.append(df)
    assert(t.currentSnapshot.get.liveFiles.size == 3) // one file per p

    val q = t.scan().where($"p" === "y")
    val scan = q.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in plan"))
    assert(scan.partitionFilters.nonEmpty,
      s"expected partition filters, got: ${scan.partitionFilters}")
    // the pruned scan must touch exactly one of the three files
    assert(scan.inputRDDs().head.partitions.nonEmpty)
    val selected = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters)
      .flatMap(_.files).size
    assert(selected == 1, s"expected 1 file after pruning, got $selected")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(2L))
  }
}
