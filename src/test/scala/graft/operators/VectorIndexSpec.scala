package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.lake.LakeTable

class VectorIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lakeOf(tag: String) = {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val t = LakeTable.create(spark, TestSpark.tmpDir(tag) + "/t", e.schema)
    t.append(e)
    (t, e)
  }

  test("persisted index search equals ivfTopK with the same quantizer") {
    val (t, e) = lakeOf("vidx")
    VectorIndex.build(t, nCentroids = 8)
    val queries = e.where($"vec_id" % 100 === 0)
      .select($"vec_id".as("query_id"), $"embedding")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getAs[Int]("rank"),
        r.getAs[Long]("corpus_id"), r.getAs[Double]("score"))).toSet
    val viaIndex = rows(VectorIndex.searchTopK(t, queries, k = 5,
      nProbe = 3))
    val direct = rows(SimilaritySearch.ivfTopK(e, queries, k = 5,
      nCentroids = 8, nProbe = 3))
    assert(viaIndex == direct)
    // index metadata recorded with the table
    assert(t.properties(VectorIndex.SnapshotProp).toLong > 0)
    assert(t.properties(VectorIndex.ColProp) == "embedding")
  }

  test("index survives appends; trained build is valid metadata too") {
    val (t, e) = lakeOf("vidx2")
    VectorIndex.build(t, nCentroids = 4, trainIterations = 2)
    val before = t.properties(VectorIndex.SnapshotProp).toLong
    // append AFTER the build: new vectors join their nearest cells
    t.append(e.limit(10).withColumn("vec_id", col("vec_id") + 100000L))
    val queries = e.where($"vec_id" === 0)
      .select($"vec_id".as("query_id"), $"embedding")
    val got = VectorIndex.searchTopK(t, queries, k = 3, nProbe = 4)
      .collect()
    assert(got.length == 3)
    // staleness is visible: the recorded snapshot predates HEAD
    assert(t.properties(VectorIndex.SnapshotProp).toLong == before)
    assert(t.currentSnapshotId.get > before)
  }

  test("searching an unindexed table fails loudly") {
    val (t, e) = lakeOf("vidx3")
    val queries = e.limit(1).select($"vec_id".as("query_id"), $"embedding")
    intercept[IllegalStateException](
      VectorIndex.searchTopK(t, queries, k = 1))
  }
}
