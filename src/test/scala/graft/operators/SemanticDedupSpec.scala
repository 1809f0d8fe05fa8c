package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SemanticDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  // two tight clusters around the axes, seeded by the two lowest ids;
  // 10/11 duplicate 0's direction, 12/13 duplicate 1's
  private lazy val corpus = Seq(
    (0L, vec(1, 0, 0, 0)),       // seed centroid 1
    (1L, vec(0, 1, 0, 0)),       // seed centroid 2
    (10L, vec(0.99, 0.01, 0, 0)),  // near-dup of 0
    (11L, vec(0.98, 0.02, 0, 0)),  // near-dup of 0 and 10
    (12L, vec(0.01, 0.99, 0, 0)),  // near-dup of 1
    (13L, vec(0, 0.98, 0.2, 0))    // near 1 but below a tight threshold
  ).toDF("vec_id", "embedding")

  test("greedy keep-first: lowest id of each within-cluster dup group survives") {
    val kept = SemanticDedup.dedup(corpus, nCentroids = 2, threshold = 0.999)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    // cos(0,10)=.99995…, cos(0,11)=.9998, cos(1,12)=.99995 → all ≥ .999
    // cos(1,13)=.9802 < .999 → 13 survives
    assert(kept == Set(0L, 1L, 13L))
  }

  test("near-dups in different clusters are both kept (cluster-bounded)") {
    // antipodes land in different clusters; identical direction vectors
    // split across clusters are NOT compared
    val c = Seq(
      (0L, vec(1, 0, 0, 0)),
      (1L, vec(-1, 0.3, 0, 0)),
      (2L, vec(-0.99, 0.31, 0, 0)) // near-dup of 1, cluster 2
    ).toDF("vec_id", "embedding")
    val kept = SemanticDedup.dedup(c, nCentroids = 2, threshold = 0.99)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("centroid_id")))
    assert(kept.map(_._1).toSet == Set(0L, 1L))
    // 2 was dropped against 1 inside cluster 2; 0 alone in cluster 1
    assert(kept.toMap == Map(0L -> 1, 1L -> 2))
  }

  test("threshold 1.1 drops nothing; output ids are unique") {
    val kept = SemanticDedup.dedup(corpus, nCentroids = 2, threshold = 1.1)
      .collect().map(_.getAs[Long]("vec_id"))
    assert(kept.sorted.toSeq == Seq(0L, 1L, 10L, 11L, 12L, 13L))
    assert(kept.distinct.length == kept.length)
  }

  test("trained centroids preserve the keep-rule invariants") {
    val kept = SemanticDedup.dedup(corpus, nCentroids = 2,
      threshold = 0.999, trainIterations = 2)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    // training moves centroids toward the cluster means; the axis
    // clusters are so separated that membership — and hence the
    // dup groups — cannot change
    assert(kept == Set(0L, 1L, 13L))
  }
}
