package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bigram LM scoring and DSIR importance weights — crafted corpora
  * with hand-computable statistics. */
class CorpusLmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bigram logprob: hand-computed conditional probabilities") {
    // corpus bigrams: (a b) ×2, (b a) ×1, (a c) ×1
    //   c(a,·)=3 → p(b|a)=2/3, p(c|a)=1/3 ; c(b,·)=1 → p(a|b)=1
    val df = Seq((1L, "a b a c"), (2L, "a b")).toDF("doc_id", "text")
    val got = NgramLm.bigramLogProb(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    // doc 1: ln(2/3), ln(1), ln(1/3) → avg = (ln2-ln3-ln3)/3
    val lp1 = (math.log(2.0 / 3) + math.log(1.0) + math.log(1.0 / 3)) / 3
    // doc 2: ln(2/3)
    val lp2 = math.log(2.0 / 3)
    def r4(x: Double) = math.rint(x * 10000) / 10000
    assert(got.length == 2)
    assert(got(0)._1 == 1L && got(0)._2 == 3L)
    assert(math.abs(got(0)._3 - r4(lp1)) < 1e-9)
    assert(math.abs(got(0)._4 - r4(math.exp(-lp1))) < 1.01e-4)
    assert(got(1)._1 == 2L && got(1)._2 == 1L)
    assert(math.abs(got(1)._3 - r4(lp2)) < 1e-9)
  }

  test("bigram logprob: sub-two-token docs drop out; case folds") {
    val df = Seq((1L, "Solo"), (2L, "  "), (3L, "A a")).toDF("doc_id", "text")
    val got = NgramLm.bigramLogProb(df, "doc_id", "text").collect()
    // only doc 3 has a bigram: (a,a) → p=1 → logprob 0, ppl 1
    assert(got.length == 1)
    assert(got(0).getLong(0) == 3L)
    assert(got(0).getDouble(2) == 0.0 && got(0).getDouble(3) == 1.0)
  }

  test("dsir: target == corpus gives identically zero weights") {
    val df = Seq((1L, "x y z"), (2L, "p q"), (3L, "x q r"))
      .toDF("doc_id", "text")
    val got = Dsir.importanceWeights(df, df, "doc_id", "text")
      .collect()
    assert(got.length == 3)
    // q and p are the SAME distribution → every ln ratio is exactly 0
    got.foreach(r => assert(r.getDouble(2) == 0.0,
      s"doc ${r.getLong(0)} weight ${r.getDouble(2)}"))
    assert(got.map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 3L, 2L -> 2L, 3L -> 3L))
  }

  test("dsir: docs resembling the target outweigh docs that don't") {
    // target is pure "alpha"-talk; doc 1 matches it, doc 2 doesn't
    val corpus = Seq(
      (1L, "alpha alpha beta"),
      (2L, "gamma delta epsilon")).toDF("doc_id", "text")
    val target = Seq(Tuple1("alpha alpha alpha beta alpha"))
      .toDF("text")
    val w = Dsir.importanceWeights(corpus, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(1L) > w(2L),
      s"target-like doc ${w(1L)} should outweigh ${w(2L)}")
    assert(w(1L) > 0 && w(2L) < 0)
  }

  test("dsir: weights are finite even for buckets absent from target") {
    val corpus = Seq((1L, "only raw tokens here nothing shared"))
      .toDF("doc_id", "text")
    val target = Seq(Tuple1("completely different words"))
      .toDF("text")
    val got = Dsir.importanceWeights(corpus, target, "doc_id", "text")
      .collect()
    assert(got.length == 1)
    assert(!got(0).getDouble(2).isNaN && !got(0).getDouble(2).isInfinite)
  }
}
