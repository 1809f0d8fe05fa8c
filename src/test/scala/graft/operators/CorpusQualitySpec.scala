package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Mixture rebalancing, corpus-statistics quality scores, PII scrub. */
class CorpusQualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("mixture: targets capped, unlisted strata whole, deterministic") {
    val df = (1L to 4000L).map(i =>
      (i, if (i <= 2000) "web" else if (i <= 3000) "books" else "code"))
      .toDF("id", "source")
    // web is 50% of the corpus; cap it at 10% of N = 400 expected
    val out = Mixture.rebalance(df, "source", Seq("id"),
      Map("web" -> 10))
    val bySource = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource("books") == 1000L && bySource("code") == 1000L,
      "unlisted strata must be kept whole")
    // hash-threshold keep rate is binomial around 400 (sd ~19)
    assert(bySource("web") > 300 && bySource("web") < 500,
      s"expected ~400 web rows, got ${bySource("web")}")
    // deterministic: the same rows every run
    val again = Mixture.rebalance(df, "source", Seq("id"),
      Map("web" -> 10)).select("id").as[Long].collect().toSet
    assert(out.select("id").as[Long].collect().toSet == again)
    // a stratum already under target is untouched (min(1,·) automatic)
    val under = Mixture.rebalance(df, "source", Seq("id"),
      Map("books" -> 80))
    assert(under.count() == 4000)
  }

  test("mixture: NULL-stratum rows kept AND counted in the corpus size N") {
    // 1000 web + 1000 null-source rows; web capped at 25% of N.
    // N is the ORIGINAL corpus size (2000, nulls included) → ~500 web
    // kept; were N wrongly the non-null total (1000), only ~250 would
    // survive. The band (380, 620) separates the two hypotheses.
    val df = (1L to 2000L).map(i =>
      (i, if (i <= 1000) "web" else null)).toDF("id", "source")
    val out = Mixture.rebalance(df, "source", Seq("id"), Map("web" -> 25))
    val nulls = out.where($"source".isNull).count()
    assert(nulls == 1000L, "NULL-stratum rows must be kept whole")
    val web = out.where($"source" === "web").count()
    assert(web > 380 && web < 620,
      s"expected ~500 web rows (25% of N=2000, nulls counted), got $web")
  }

  test("oov rate: tokens outside the top-K vocabulary are counted") {
    val df = Seq(
      (1L, "a a a b"), // corpus counts: a=4, z=3, b=2 → vocab(K=2)={a,z}
      (2L, "a b z"),
      (3L, "z z"))
      .toDF("doc_id", "text")
    val got = LexicalQuality.oovRate(df, "doc_id", "text", vocabSize = 2)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_oov", "oov_rate")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 4L, 1L, 0.25), (2L, 3L, 1L, 0.333333),
      (3L, 2L, 0L, 0.0)))
  }

  test("unigram log-prob: rare-token docs score lower") {
    val df = Seq(
      (1L, "the the the the"), // common tokens
      (2L, "xyzzy")) // a hapax
      .toDF("doc_id", "text")
    val got = LexicalQuality.unigramLogProb(df, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "logprob")
      .as[(Long, Long, Double)].collect().toSeq
    // corpus: the×4 (p=0.8), xyzzy×1 (p=0.2)
    assert(got(0)._3 == BigDecimal(math.log(0.8))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got(1)._3 == BigDecimal(math.log(0.2))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got(0)._3 > got(1)._3)
  }

  test("pii scrub: emails, phones, ips redacted; counts from original") {
    val df = Seq(
      (1L, "mail bob.smith+x@example.co.uk now"),
      (2L, "call 555-123-4567 or 555 987 6543"),
      (3L, "host 10.0.255.3 and 192.168.1.1"),
      (4L, "clean text, nothing here")).toDF("doc_id", "text")
    val got = PiiScrub.scrub(df, "text")
      .orderBy("doc_id")
      .select("doc_id", "n_emails", "n_phones", "n_ips", "scrubbed")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(got(0) == ((1L, 1L, 0L, 0L, "mail <EMAIL> now")))
    assert(got(1) == ((2L, 0L, 2L, 0L, "call <PHONE> or <PHONE>")))
    assert(got(2) == ((3L, 0L, 0L, 2L, "host <IP> and <IP>")))
    assert(got(3) == ((4L, 0L, 0L, 0L, "clean text, nothing here")))
  }
}
