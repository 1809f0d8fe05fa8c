package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SimilaritySearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  // small corpus with a known neighborhood structure
  private lazy val corpus = Seq(
    (0L, vec(1, 0, 0, 0)),
    (1L, vec(0.9, 0.1, 0, 0)),   // closest to 0
    (2L, vec(0, 1, 0, 0)),
    (3L, vec(0, 0.9, 0.1, 0)),   // closest to 2
    (4L, vec(-1, 0, 0, 0))       // antipode of 0
  ).toDF("vec_id", "embedding")

  test("brute force top-k returns exact ranking") {
    val queries = corpus.where($"vec_id" === 0)
      .select($"vec_id".as("query_id"), $"embedding")
    val got = SimilaritySearch.bruteForceTopK(corpus, queries, k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("corpus_id")))
    // rank1: itself (cos 1), rank2: vec 1, rank3: one of the orthogonals
    assert(got(0) == ((1, 0L)))
    assert(got(1) == ((2, 1L)))
    assert(got.length == 3)
    assert(got(2)._2 != 4L) // the antipode is last, never top-3
  }

  test("lsh top-k scores agree with brute force for returned ids") {
    val e = TestSpark.spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = e.where($"vec_id" % 100 === 0)
      .select($"vec_id".as("query_id"), $"embedding")
    val bf = SimilaritySearch.bruteForceTopK(e, queries, k = 10)
      .select("query_id", "corpus_id", "score")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val lsh = SimilaritySearch.lshTopK(e, queries, k = 10, nPlanes = 6)
      .collect()
    assert(lsh.nonEmpty)
    // every LSH hit that brute force also ranked must carry the same score
    lsh.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("corpus_id"))
      bf.get(key).foreach(s => assert(s == r.getAs[Double]("score")))
    }
  }

  test("ivf with nProbe == nCentroids is exhaustive (equals brute force)") {
    val e = TestSpark.spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = e.where($"vec_id" % 100 === 0)
      .select($"vec_id".as("query_id"), $"embedding")
    val bf = SimilaritySearch.bruteForceTopK(e, queries, k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("corpus_id"), r.getAs[Double]("score"))).toSet
    val ivf = SimilaritySearch.ivfTopK(e, queries, k = 5,
      nCentroids = 8, nProbe = 8)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("corpus_id"), r.getAs[Double]("score"))).toSet
    assert(ivf == bf)
  }

  test("ivf partial probe scores agree with brute force; corpus unshuffled") {
    val e = TestSpark.spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = e.where($"vec_id" % 100 === 0)
      .select($"vec_id".as("query_id"), $"embedding")
    val bf = SimilaritySearch.bruteForceTopK(e, queries, k = 50)
      .select("query_id", "corpus_id", "score")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val ivf = SimilaritySearch.ivfTopK(e, queries, k = 5,
      nCentroids = 16, nProbe = 4)
    ivf.collect().foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("corpus_id"))
      bf.get(key).foreach(s => assert(s == r.getAs[Double]("score")))
    }
    // the plan must not shuffle or window the corpus for assignment:
    // the only hash exchange is the final per-query top-k window, and
    // every Window operator carries a partition spec
    // AQE plan strings append an "== Initial Plan ==" section that
    // duplicates nodes — inspect only the final plan
    val plan = ivf.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(exchanges <= 1, s"unexpected shuffles in IVF plan:\n$plan")
    assert(!plan.contains("hashpartitioning(corpus_id"),
      s"corpus shuffled for assignment:\n$plan")
    ivf.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.foreach(w => assert(w.partitionSpec.nonEmpty,
      "window without partition spec in IVF plan"))
  }

  test("near-dup pairs finds planted duplicates") {
    val planted = Seq(
      (100L, vec(0.5, 0.5, 0.5, 0.5)),
      (101L, vec(0.5, 0.5, 0.5, 0.5)), // exact dup
      (102L, vec(-0.5, 0.4, -0.3, 0.2))
    ).toDF("vec_id", "embedding")
    val pairs = SimilaritySearch.cosineNearDupPairs(planted,
      threshold = 0.99, nPlanes = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((100L, 101L)))
  }
}
