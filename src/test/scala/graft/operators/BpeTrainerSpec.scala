package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BpeTrainerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("learns the classic merges on the Sennrich-style toy corpus") {
    // word counts: low×5, lower×2, newest×6, widest×3 — the corpus
    // from the BPE paper's worked example
    val docs = Seq(
      Seq.fill(5)("low"), Seq.fill(2)("lower"),
      Seq.fill(6)("newest"), Seq.fill(3)("widest")
    ).flatten.mkString(" ")
    val df = Seq(Tuple1(docs)).toDF("text")
    val merges = BpeTrainer.train(df, "text", numMerges = 4)
    // hand-derived rounds: (e,s)=9 beats the (s,t</w>)=9 tie on the
    // lexicographic break; then (es,t</w>)=9; then (l,o)=7; then the
    // 6-count tie (e,w)/(n,e)/(w,est</w>) goes to (e,w)
    assert(merges == Seq(("e", "s"), ("es", "t</w>"), ("l", "o"),
      ("e", "w")))
    // the pure reference segmenter agrees with the learned merges
    assert(BpeTrainer.segmentWord("newest", merges) ==
      Seq("n", "ew", "est</w>"))
    assert(BpeTrainer.segmentWord("low", merges) == Seq("lo", "w</w>"))
  }

  test("greedy left-to-right merging handles overlapping pairs") {
    // symbols a,a,a,a</w>; merge (a,a) greedily: first two fuse to
    // "aa", the third 'a' cannot fuse with "aa", the last is 'a</w>'
    val seg = BpeTrainer.segmentWord("aaaa", Seq(("a", "a")))
    assert(seg == Seq("aa", "a", "a</w>"))
  }

  test("min pair count stops training on a diverse corpus") {
    val df = Seq(Tuple1("ab cd ef gh")).toDF("text")
    val merges = BpeTrainer.train(df, "text", numMerges = 10,
      minPairCount = 2)
    assert(merges.isEmpty) // every pair occurs once
  }

  test("trained merges compress the real corpus vocabulary") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = BpeTrainer.train(docs, "text", numMerges = 8)
    assert(merges.length == 8)
    // applying the merges shortens frequent words' segmentations
    val words = Seq("table", "query", "value")
    val lens = words.map(w =>
      BpeTrainer.segmentWord(w, merges).length)
    assert(lens.exists(l => l < "table".length + 0),
      s"no compression: $lens")
  }

  test("property: every learned merge strictly compresses the corpus " +
      "token count; training is deterministic") {
    import org.scalacheck.{Gen, Prop}
    // small alphabet forces repeated pairs; words 1..6 chars, 4..20
    // words — enough structure to learn real merges, small enough for
    // per-case distributed training
    val wordGen = Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val corpusGen = Gen.choose(4, 20).flatMap(n =>
      Gen.listOfN(n, wordGen))
    def corpusTokens(words: Seq[String],
        merges: Seq[(String, String)]): Long =
      words.map(w => BpeTrainer.segmentWord(w, merges).length.toLong).sum
    val prop = Prop.forAllNoShrink(corpusGen) { words =>
      val df = Seq(Tuple1(words.mkString(" "))).toDF("text")
      val merges = BpeTrainer.train(df, "text", numMerges = 4,
        minPairCount = 2)
      // token count under each merge PREFIX: STRICTLY decreasing —
      // a learned pair occurs >= minPairCount times in the (possibly
      // overlapping) pair count, so greedy application fuses at least
      // once; overlaps mean the saving can be less than the count
      // ("aaa" counts (a,a) twice but fuses once), never zero
      val counts = (0 to merges.length).map(k =>
        corpusTokens(words, merges.take(k)))
      val monotone = counts.sliding(2).forall {
        case Seq(prev, next) => next < prev
        case _ => true
      }
      // determinism: re-training learns the identical sequence (the
      // argmax tie-break is total: count desc, pair asc)
      val again = BpeTrainer.train(df, "text", numMerges = 4,
        minPairCount = 2)
      monotone && again == merges
    }
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(6)
    val res = org.scalacheck.Test.check(params, prop)
    assert(res.passed, res.status.toString)
  }
}
