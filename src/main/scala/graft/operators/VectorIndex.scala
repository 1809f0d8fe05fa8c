package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.lake.LakeTable

/** ANN index AS LAKE METADATA: the IVF coarse quantizer trained over a
  * lake table's embedding column persists in the table's own
  * properties (`graft.vindex.*`) — KB-scale centroid JSON riding the
  * exact machinery every other table change rides. The index therefore
  * versions WITH the data: it is atomic with the commit that wrote it,
  * travels through branches/tags, survives engine restarts, and a
  * `VERSION AS OF` read can pair old vectors with the index trained on
  * them. This is the production story a side-file index (FAISS file on
  * some volume) cannot give a governed 100 TB corpus.
  *
  * Search loads the centroids from properties (one HEAD read — no
  * training, no sampling scan) and runs the same probe/assign shapes
  * as [[SimilaritySearch.ivfTopK]]: centroid literals, map-side
  * assignment, corpus ⋈ broadcast(probes). An index is APPROXIMATE by
  * contract, so appends after a build keep working (new vectors join
  * their nearest existing cell); `sourceSnapshot` records staleness
  * for a rebuild policy. */
object VectorIndex {

  val CentroidsProp = "graft.vindex.centroids"
  val SnapshotProp = "graft.vindex.snapshot"
  val ColProp = "graft.vindex.column"

  /** Train (or seed, `trainIterations = 0`) the IVF quantizer over the
    * table's current vectors and persist it. Returns the commit id. */
  def build(table: LakeTable, vecCol: String = "embedding",
      idCol: String = "vec_id", nCentroids: Int = 16,
      trainIterations: Int = 0): Long = {
    val c = table.scan().select(col(idCol).as("corpus_id"),
      col(vecCol).as("corpus_vec"))
    val seeds = c.orderBy("corpus_id").limit(nCentroids).collect()
      .zipWithIndex.map { case (r, i) => (i + 1) -> r.getSeq[Float](1) }
      .toSeq
    require(seeds.nonEmpty, "cannot index an empty table")
    val cents =
      if (trainIterations == 0) seeds
      else SimilaritySearch.trainCentroids(c, seeds, trainIterations)
    val json = cents.map { case (id, v) =>
      s"""{"id":$id,"vec":[${v.mkString(",")}]}"""
    }.mkString("[", ",", "]")
    table.setProperties(Map(
      CentroidsProp -> json,
      SnapshotProp -> table.currentSnapshotId.getOrElse(0L).toString,
      ColProp -> vecCol))
  }

  private def loadCentroids(table: LakeTable): Seq[(Int, Seq[Float])] = {
    val json = table.properties.getOrElse(CentroidsProp,
      throw new IllegalStateException(
        s"no vector index on ${table.root} — run VectorIndex.build"))
    val n = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(json)
    (0 until n.size).map { i =>
      val o = n.get(i)
      val vec = (0 until o.get("vec").size)
        .map(j => o.get("vec").get(j).floatValue())
      o.get("id").asInt -> vec
    }
  }

  /** Approximate top-k over the table using the PERSISTED quantizer —
    * identical plan shape to [[SimilaritySearch.ivfTopK]], zero
    * training cost at query time. */
  def searchTopK(table: LakeTable, queries: DataFrame, k: Int,
      nProbe: Int = 4, idCol: String = "vec_id",
      queryIdCol: String = "query_id"): DataFrame = {
    val cents = loadCentroids(table)
    require(nProbe >= 1 && nProbe <= cents.size)
    val vecCol = table.properties(ColProp)
    val centLit = SimilaritySearch.centroidLiteral(cents)
    val assigned = table.scan()
      .select(col(idCol).as("corpus_id"), col(vecCol).as("corpus_vec"))
      .withColumn("centroid_id",
        SimilaritySearch.nearestCentroid(centLit, col("corpus_vec")))
    val probes = queries
      .select(col(queryIdCol), col(table.properties(ColProp))
        .as("query_vec"))
      .withColumn("centroid_id",
        explode(slice(
          transform(
            array_sort(transform(centLit, cs =>
              struct((-graft.plans.expressions.cosine(col("query_vec"),
                cs.getField("vec"))).as("negsim"),
                cs.getField("id").as("id")))),
            s => s.getField("id")),
          1, nProbe)))
      .select(col("centroid_id"), col(queryIdCol), col("query_vec"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(queryIdCol)
      .orderBy(col("score").desc, col("corpus_id").asc)
    assigned.join(broadcast(probes), Seq("centroid_id"))
      .withColumn("score", graft.plans.expressions.cosine(
        col("corpus_vec"), col("query_vec")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryIdCol), col("rank"), col("corpus_id"),
        round(col("score"), 6).as("score"))
  }
}
