package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Exact-substring dedup (ExactSubstr): span discovery must find
  * precisely the positions covered by a length-L gram occurring more
  * than once in the corpus, merge overlaps into maximal spans, and
  * removal must cut exactly those characters. */
class ExactSubstringSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cross-document repeat yields one maximal span per side; " +
      "unique text has no row") {
    // L=10; the 20-char block "AAAAABBBBBCCCCCDDDDD" is shared, so
    // every 10-gram inside it duplicates; flanks are unique
    val shared = "AAAAABBBBBCCCCCDDDDD"
    val docs = Seq(
      (1L, s"xxxxx${shared}yyyyy"),
      (2L, s"qqqqq${shared}rrrrr"),
      (3L, "entirely unique text with nothing repeated at all")
    ).toDF("doc_id", "text")
    val out = TextDedup.exactSubstringSpans(docs, "text", "doc_id", 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    // spans cover [5, 25) in both docs: 20 chars, one island
    assert(out == Map(1L -> (1L, 20L), 2L -> (1L, 20L)))
  }

  test("same-document internal repeat counts; spans merge when grams " +
      "overlap and stay separate when apart") {
    val rep = "0123456789" // L=10 exact block, repeated twice in doc 1
    // the middle must not self-repeat at 10-gram granularity, or its
    // own duplicated grams would bridge the two spans into one
    val docs = Seq(
      (1L, s"${rep}QWERTYUIOPASDFGHJK${rep}"),
      (2L, "zz")
    ).toDF("doc_id", "text")
    val rows = TextDedup.exactSubstringSpans(docs, "text", "doc_id", 10)
      .where(col("doc_id") === 1).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(1) == 2L, "two separate spans")
    assert(r.getLong(2) == 20L, "10 chars each")
    val spans = r.getSeq[org.apache.spark.sql.Row](3)
      .map(s => (s.getLong(0), s.getLong(1)))
    assert(spans == Seq((0L, 10L), (28L, 38L)))
  }

  test("removeSpans cuts exactly the spans; no-span docs pass through") {
    val shared = "AAAAABBBBBCCCCCDDDDD"
    val docs = Seq(
      (1L, s"xxxxx${shared}yyyyy"),
      (2L, s"qqqqq${shared}rrrrr"),
      (3L, "unique")
    ).toDF("doc_id", "text")
    val spans = TextDedup.exactSubstringSpans(docs, "text", "doc_id", 10)
    val cleaned = docs.join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"),
        TextDedup.removeSpans(col("text"), col("spans")).as("clean"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cleaned(1L) == "xxxxxyyyyy")
    assert(cleaned(2L) == "qqqqqrrrrr")
    assert(cleaned(3L) == "unique")
  }

  test("ground-truth fuzz vs a brute-force oracle") {
    val L = 8
    val rnd = new scala.util.Random(42)
    val vocab = "abcd"
    def txt(n: Int) =
      (1 to n).map(_ => vocab(rnd.nextInt(vocab.length))).mkString
    // small alphabet + 60-char docs → plenty of genuine 8-gram repeats
    val docs = (1L to 20L).map(i => (i, txt(40 + rnd.nextInt(40))))
    val df = docs.toDF("doc_id", "text")

    // brute force: every position whose L-gram occurs >1 time anywhere
    val all = docs.flatMap { case (id, t) =>
      (0 to t.length - L).map(p => (id, p.toLong, t.substring(p, p + L)))
    }
    val counts = all.groupBy(_._3).map { case (g, v) => g -> v.size }
    val expected = docs.map { case (id, t) =>
      val dupPos = (0 to t.length - L)
        .filter(p => counts(t.substring(p, p + L)) > 1).map(_.toLong)
      // island merge
      var spans = List.empty[(Long, Long)]
      dupPos.foreach { p =>
        spans match {
          case (s, e) :: rest if p <= e => spans = (s, math.max(e, p + L)) :: rest
          case _ => spans = (p, p + L) :: spans
        }
      }
      id -> spans.reverse
    }.filter(_._2.nonEmpty).toMap

    val got = TextDedup.exactSubstringSpans(df, "text", "doc_id", L)
      .collect().map { r =>
        r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](3)
          .map(s => (s.getLong(0), s.getLong(1))).toList
      }.toMap
    assert(got == expected)

    // collision pinning: narrow the hash space so DISTINCT grams are
    // FORCED into shared buckets (hashSpace=1 puts the whole corpus
    // into ONE bucket — the maximal collision storm) and the string
    // verify must still produce byte-identical spans
    for (space <- Seq(1L, 2L, 7L)) {
      val collided = TextDedup
        .exactSubstringSpans(df, "text", "doc_id", L, hashSpace = space)
        .collect().map { r =>
          r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](3)
            .map(s => (s.getLong(0), s.getLong(1))).toList
        }.toMap
      assert(collided == expected,
        s"hashSpace=$space diverged from the full-hash result")
    }
  }

  test("hash collision between two DISTINCT grams must not fabricate " +
      "duplicates; a genuine duplicate sharing the bucket still verifies") {
    val L = 10
    // hashSpace=1: every gram lands in bucket 0. Doc 1 and doc 2 have
    // completely different text (every gram unique corpus-wide), so
    // despite the forced hash collision NO span may be reported for
    // them. Docs 3 and 4 share a block — their spans must survive the
    // collision storm.
    val shared = "SHAREDBLOCKSHARED"
    val docs = Seq(
      (1L, "abcdefghijklmnop"),
      (2L, "qrstuvwxyz012345"),
      (3L, s"___${shared}___"),
      (4L, s"+++${shared}+++")
    ).toDF("doc_id", "text")
    val out = TextDedup
      .exactSubstringSpans(docs, "text", "doc_id", L, hashSpace = 1L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // spans cover the shared 17-char block: positions 3..10 are dup
    // gram starts, island [3, 3+7+L) = [3, 20) → 17 chars
    assert(out == Map(3L -> (1L, 17L), 4L -> (1L, 17L)),
      s"collision fabricated or lost spans: $out")
  }
}
