package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.plans.expressions._

class ExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("cosine rejects mismatched dimensions loudly") {
    val df = Seq((vec(1, 2, 3), vec(1, 2))).toDF("a", "b")
    val e = intercept[Exception](
      df.select(cosine($"a", $"b")).collect())
    assert(e.getMessage.contains("dimensions differ") ||
      Option(e.getCause).exists(_.getMessage.contains("dimensions differ")))
  }

  test("cosine matches hand-computed values (codegen path)") {
    val df = Seq(
      (vec(1, 0, 0), vec(1, 0, 0)),   // identical → 1
      (vec(1, 0, 0), vec(0, 1, 0)),   // orthogonal → 0
      (vec(1, 1, 0), vec(1, 0, 0)),   // 45° → 1/√2
      (vec(0, 0, 0), vec(1, 2, 3))    // zero vector → 0 by convention
    ).toDF("a", "b")
    val got = df.select(round(cosine($"a", $"b"), 6)).collect().map(_.getDouble(0))
    assert(got(0) == 1.0)
    assert(got(1) == 0.0)
    assert(math.abs(got(2) - 0.707107) < 1e-6)
    assert(got(3) == 0.0)
  }

  test("cosine interpreted eval agrees with codegen result") {
    val df = Seq((vec(0.3, -0.7, 2.1), vec(-1.2, 0.4, 0.9))).toDF("a", "b")
    val code = df.select(cosine($"a", $"b")).collect().head.getDouble(0)
    // force interpreted path through a non-codegen context: eval directly
    val e = CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        vec(0.3, -0.7, 2.1).toSeq,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        vec(-1.2, 0.4, 0.9).toSeq,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)))
    assert(math.abs(e.eval(null).asInstanceOf[Double] - code) < 1e-12)
  }

  test("fingerprint: equal text → equal fp; case-insensitive; distinct text differs") {
    val df = Seq(
      ("a", "the quick brown fox jumps over the lazy dog"),
      ("b", "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG"),
      ("c", "an entirely different document body here")
    ).toDF("id", "text").select($"id", fingerprint($"text", 16).as("fp"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("a") == m("b"))
    assert(m("a") != m("c"))
  }

  test("fingerprint: small interior edit usually preserved by min-window") {
    // identical prefix/suffix with one distant change: the minimal window
    // often survives — just assert determinism + length-independence here
    val one = TextFingerprint.minRollingHash("abcdefghij" * 10, 16)
    val two = TextFingerprint.minRollingHash("abcdefghij" * 10, 16)
    assert(one == two)
  }

  test("minhash: identical shingle sets → identical signatures; sim sets agree mostly") {
    val df = Seq(
      ("a", Seq("x y z", "y z w", "z w v")),
      ("b", Seq("x y z", "y z w", "z w v")),
      ("c", Seq("p q r", "q r s", "r s t"))
    ).toDF("id", "sh")
      .select($"id", minhashSignature(
        transform($"sh", s => xxhash64(s)), 64, 42L).as("sig"))
    val rows = df.collect().map(r =>
      r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(rows("a") == rows("b"))
    assert(rows("a") != rows("c"))
    assert(rows("a").length == 64)
  }

  test("simhash: identical token sets equal; disjoint sets differ in many bits") {
    val df = Seq(
      ("a", Seq("alpha", "beta", "gamma", "delta")),
      ("b", Seq("alpha", "beta", "gamma", "delta")),
      ("c", Seq("zeta", "eta", "theta", "iota"))
    ).toDF("id", "toks")
      .select($"id", simhash64(transform($"toks", t => xxhash64(t))).as("h"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("a") == m("b"))
    assert(java.lang.Long.bitCount(m("a") ^ m("c")) > 10)
  }

  test("hyperplane signature: deterministic, similar vectors collide") {
    val base = vec(1, 2, 3, 4, 5, 6, 7, 8)
    val near = vec(1.01, 2.01, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0)
    val df = Seq(("a", base), ("b", base), ("n", near))
      .toDF("id", "v")
      .select($"id", hyperplaneSignature($"v", 12, 7L).as("sig"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("a") == m("b"))
    assert(m("a") == m("n")) // tiny perturbation keeps all 12 signs
  }
}
