package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Corpus-preparation operators: benchmark decontamination, portable
  * deterministic sampling, and token-budget shard packing. */
class PipelinePrepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("contamination: exact overlap fractions, clean docs score 0") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely novel words nobody benchmarked ever before now"),
      (3L, "the quick brown fox sat still")).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "the quick brown fox jumps high")).toDF("doc_id", "text")
    val got = Contamination.score(corpus, bench)
      .orderBy("doc_id").collect()
    // doc 1: 7 trigrams, hits = {the quick brown, quick brown fox,
    //        brown fox jumps} = 3
    assert(got(0).getLong(1) == 7 && got(0).getLong(2) == 3)
    assert(got(0).getDouble(3) == 0.4286)
    // doc 2: zero overlap
    assert(got(1).getLong(2) == 0 && got(1).getDouble(3) == 0.0)
    // doc 3: 4 trigrams, hits = {the quick brown, quick brown fox} = 2
    assert(got(2).getLong(1) == 4 && got(2).getLong(2) == 2)
  }

  test("contamination: short docs fall back to whole-text gram") {
    val corpus = Seq((1L, "two words"), (2L, "other pair"))
      .toDF("doc_id", "text")
    val bench = Seq((9L, "two words")).toDF("doc_id", "text")
    val got = Contamination.score(corpus, bench)
      .orderBy("doc_id").collect()
    assert(got(0).getLong(1) == 1 && got(0).getLong(2) == 1)
    assert(got(1).getLong(2) == 0)
  }

  test("sampling: deterministic, nested, and rate-accurate") {
    val df = (1L to 10000L).toDF("id")
    val half = Sampling.deterministic(df, Seq("id"), 0.5)
    val n = half.count()
    assert(math.abs(n - 5000L) < 300, s"p=0.5 kept $n of 10000")
    // same call -> identical rows (determinism, not just same count)
    assert(Sampling.deterministic(df, Seq("id"), 0.5)
      .except(half).count() == 0)
    // nested: the 10% sample is a subset of the 50% sample
    val tenth = Sampling.deterministic(df, Seq("id"), 0.1)
    assert(tenth.except(half).count() == 0)
    // a different salt draws an (almost surely) different set
    assert(Sampling.deterministic(df, Seq("id"), 0.5, salt = "other")
      .except(half).count() > 0)
    // boundaries
    assert(Sampling.deterministic(df, Seq("id"), 1.0).count() == 10000)
    assert(Sampling.deterministic(df, Seq("id"), 0.0).count() == 0)
  }

  test("stratified sampling applies per-stratum rates") {
    val df = (1L to 4000L).map(i => (i, if (i <= 2000) "en" else "fr"))
      .toDF("id", "lang")
    val got = Sampling.stratified(df, "lang", Map("en" -> 0.25),
      Seq("id"))
    val en = got.where($"lang" === "en").count()
    val fr = got.where($"lang" === "fr").count()
    assert(fr == 2000L) // default fraction 1.0 keeps everything
    assert(math.abs(en - 500L) < 150, s"en kept $en of 2000")
  }

  test("repetition metrics: exact fractions on known docs") {
    val docs = Seq(
      (1L, "a a a b"),     // degenerate
      (2L, "x y z"),       // diverse
      (3L, "")).toDF("doc_id", "text")
    val got = RepetitionMetrics.compute(docs).orderBy("doc_id").collect()
    // doc 1: 4 tokens, 2 distinct; top 'a' 3/4; bigrams (a a, a a, a b)
    assert(got(0).getLong(1) == 4L)
    assert(got(0).getDouble(2) == 0.5)
    assert(got(0).getDouble(3) == 0.75)
    assert(got(0).getDouble(4) == 0.3333)
    // doc 2: no repetition anywhere
    assert(got(1).getDouble(2) == 1.0)
    assert(got(1).getDouble(3) == 0.3333)
    assert(got(1).getDouble(4) == 0.0)
    // doc 3: empty -> all-zero metrics, row still present
    assert(got(2).getLong(1) == 0L)
    assert(got(2).getDouble(2) == 0.0 && got(2).getDouble(4) == 0.0)
  }

  test("shard packing: budget respected, order preserved, distributed") {
    val df = (1L to 1000L).map(i => (i, 10L + i % 7)).toDF("id", "w")
    val got = ShardPacking.assign(df, "w", "id", budget = 500L,
      numRangePartitions = 6)
    val rows = got.orderBy("id").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)))
    // shard ids are non-decreasing in id order and start at 0
    assert(rows.head._3 == 0L)
    assert(rows.sliding(2).forall { case Array(a, b) => a._3 <= b._3 })
    // every shard's row weights sum to budget ± one straddling doc
    val byShard = rows.groupBy(_._3).view.mapValues(_.map(_._2).sum)
    byShard.toSeq.sortBy(_._1).dropRight(1).foreach { case (sid, tot) =>
      assert(tot >= 500L - 16 && tot <= 500L + 16,
        s"shard $sid holds $tot (budget 500)")
    }
    // exact agreement with the single-window formula
    val naive = df.withColumn("cum",
        sum($"w").over(org.apache.spark.sql.expressions.Window
          .orderBy("id").rowsBetween(Long.MinValue, 0)))
      .withColumn("shard", floor(($"cum" - $"w") / 500.0).cast("long"))
      .select("id", "w", "shard")
    assert(got.select("id", "w", "shard").except(naive).count() == 0)
    assert(naive.except(got.select("id", "w", "shard")).count() == 0)
  }
}
