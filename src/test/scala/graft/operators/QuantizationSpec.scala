package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class QuantizationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("codes bounded, reconstruction error within half a step") {
    val vecs = Seq(
      (1L, Array(0.1f, -0.5f, 0.25f, 1.0f)),
      (2L, Array(-2.0f, 0.0f, 1.5f, 0.75f)),
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f)) // zero vector: scale 0
    ).toDF("vec_id", "embedding")
    val q = SimilaritySearch.quantizeInt8(vecs).collect()
    q.foreach { r =>
      val orig = r.getSeq[Float](1)
      val scale = r.getDouble(2)
      val codes = r.getSeq[Int](3)
      assert(codes.forall(c => c >= -127 && c <= 127))
      if (scale == 0d) assert(codes.forall(_ == 0))
      else orig.zip(codes).foreach { case (x, c) =>
        assert(math.abs(c * scale - x) <= scale / 2 + 1e-9,
          s"x=$x code=$c scale=$scale")
      }
    }
  }

  test("quantized top-k keeps exact ranking on well-separated vectors") {
    // corpus directions ~90 degrees apart: int8 noise (<1% relative)
    // cannot flip a ranking with gaps this large
    val corpus = Seq(
      (1L, Array(1.0f, 0.02f, 0.01f)),
      (2L, Array(0.01f, 1.0f, 0.03f)),
      (3L, Array(0.02f, 0.01f, 1.0f)),
      (4L, Array(0.9f, 0.45f, 0.01f))
    ).toDF("vec_id", "embedding")
    val queries = Seq((100L, Array(1.0f, 0.1f, 0.0f)))
      .toDF("query_id", "embedding")
    val exact = SimilaritySearch.bruteForceTopK(corpus, queries, k = 4)
      .orderBy("rank").select("corpus_id")
      .collect().map(_.getLong(0)).toSeq
    val quant = SimilaritySearch.quantizedTopK(corpus, queries, k = 4)
      .orderBy("rank").select("corpus_id")
      .collect().map(_.getLong(0)).toSeq
    assert(quant == exact, s"quant=$quant exact=$exact")
  }
}
