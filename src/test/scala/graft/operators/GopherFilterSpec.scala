package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GopherFilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)],
      t: GopherFilter.Thresholds = GopherFilter.Thresholds()) =
    GopherFilter.filter(docs.toDF("doc_id", "text"), t = t)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(2), Option(r.getString(3)))).toMap

  test("each rule fires on its crafted document, first-match order") {
    val loose = GopherFilter.Thresholds(minWords = 3, maxWords = 8,
      maxTopWordFrac = 0.5, maxDupBigramFrac = 0.4)
    val got = run(Seq(
      1L -> "alpha beta gamma delta run",              // clean
      2L -> "one two",                                 // too few
      3L -> "a b c d e f g h i j",                     // too many + short words: few/many first
      4L -> "aa bb cc %%%%%%%%%% dd",                  // symbol heavy
      5L -> "12 34 56 78",                             // non-alpha words (digits)
      6L -> "spam spam spam spam x",                   // top word dominates
      7L -> "ab cd ab cd ab cd"                        // repeated bigrams
    ), loose)
    assert(got(1L) == ((true, None)))
    assert(got(2L) == ((false, Some("too_few_words"))))
    assert(got(3L) == ((false, Some("too_many_words"))))
    assert(got(4L) == ((false, Some("symbol_heavy"))))
    assert(got(5L) == ((false, Some("non_alpha_words"))))
    assert(got(6L) == ((false, Some("top_word_dominates"))))
    assert(got(7L) == ((false, Some("repeated_bigrams"))))
  }

  test("mean word length rules and empty text") {
    val t = GopherFilter.Thresholds(minWords = 1, maxWords = 100,
      minMeanWordLen = 3.0, maxMeanWordLen = 6.0,
      maxTopWordFrac = 1.0, maxDupBigramFrac = 1.0)
    val got = run(Seq(
      1L -> "aa bb cc",                                  // mean 2 < 3
      2L -> "abcdefgh abcdefgX abcdefgh kl mn",          // mixed
      3L -> "extraordinarily extraordinarilX",           // mean 16 > 6
      4L -> ""), t)                                      // 0 tokens
    assert(got(1L)._2.contains("mean_word_too_short"))
    assert(got(3L)._2.contains("mean_word_too_long"))
    assert(got(4L)._2.contains("too_few_words"))
  }

  test("the per-rule audit composes as a plain groupBy") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val out = GopherFilter.filter(docs)
    val audit = out.groupBy("fail_reason").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(audit.values.sum == docs.count())
    assert(audit.getOrElse(None, 0L) > 0, "nothing kept — thresholds off")
  }
}
