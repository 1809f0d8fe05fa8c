package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class QualityClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("NB scores match the closed-form formula on a hand-checked corpus") {
    val corpus = Seq(
      (1L, "good good", true),
      (2L, "good bad", true),
      (3L, "bad bad", false)
    ).toDF("doc_id", "text", "y")
    val got = QualityClassifier.trainScore(corpus, col("y"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("nb_score"),
          r.getAs[Boolean]("label_pred")))).toMap

    // counts: good → (cpos 3, cneg 0); bad → (cpos 1, cneg 2)
    // npos 4, nneg 2, v 2, priors ln((2+1)/(1+1))
    val wGood = math.log(4.0 / 6.0) - math.log(1.0 / 4.0)
    val wBad = math.log(2.0 / 6.0) - math.log(3.0 / 4.0)
    val prior = math.log(3.0 / 2.0)
    def r4(x: Double) = math.rint(x * 10000) / 10000
    assert(got(1L) == ((2L, r4(prior + 2 * wGood), true)))
    assert(got(2L) == ((2L, r4(prior + wGood + wBad), true)))
    assert(got(3L) == ((2L, r4(prior + 2 * wBad), false)))
  }

  test("a token-less document is dropped; labels may be expressions") {
    val corpus = Seq(
      (1L, "alpha alpha alpha", "en"),
      (2L, "beta beta", "de"),
      (3L, "???", "en") // tokenizes to nothing
    ).toDF("doc_id", "text", "lang")
    val got = QualityClassifier.trainScore(corpus, col("lang") === "en")
    assert(got.count() == 2)
    val byId = got.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Boolean]("label_pred")).toMap
    // 'alpha' only ever appears in the positive class and vice versa
    assert(byId(1L) && !byId(2L))
  }

  test("hash-join fallback produces identical results") {
    val corpus = Seq(
      (1L, "x y z", true), (2L, "x q", false), (3L, "z z q", true)
    ).toDF("doc_id", "text", "y")
    val a = QualityClassifier.trainScore(corpus, col("y"))
      .orderBy("doc_id").collect().toSeq
    val b = QualityClassifier.trainScore(corpus, col("y"),
        broadcastVocab = false)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
