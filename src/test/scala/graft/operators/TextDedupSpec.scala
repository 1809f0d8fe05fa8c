package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TextDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // two exact dups (1,2), one near-dup of them (3: one word changed),
  // one unrelated (4)
  private lazy val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"),
    (3L, "the quick brown fox jumps over the sleepy dog again and again"),
    (4L, "completely unrelated text about spark query engines and shuffles")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps min id") {
    val got = TextDedup.exact(corpus).collect()
      .map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("n_copies")))
    assert(got.length == 3) // 3 distinct texts
    assert(got.contains((1L, 2L))) // docs 1+2 collapsed, min id kept
  }

  test("minhash finds the exact pair and the near pair, not the unrelated") {
    val pairs = TextDedup.minHashPairs(corpus, k = 128, bands = 32,
      shingleSize = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("simhash: exact pair at hamming 0; unrelated doc excluded") {
    val pairs = TextDedup.simHashPairs(corpus, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val exact = pairs.find(p => p._1 == 1L && p._2 == 2L)
    assert(exact.exists(_._3 == 0))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("ngram jaccard computes the hand-checked value") {
    // doc1/doc2 identical → jaccard 1.0; doc3 differs in one word:
    // 12 tokens → 10 trigrams each, changed word hits 3 trigrams →
    // shared 7, union 13 → 0.5385
    val pairs = TextDedup.ngramJaccardPairs(corpus, n = 3, threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    assert(pairs(((1L, 2L))) == 1.0)
    assert(math.abs(pairs(((1L, 3L))) - 0.5385) < 1e-4)
    assert(math.abs(pairs(((2L, 3L))) - 0.5385) < 1e-4)
    assert(pairs.size == 3)
  }

  test("ngram jaccard maxDocFreq prunes ubiquitous grams") {
    val all = TextDedup.ngramJaccardPairs(corpus, n = 3, threshold = 0.01)
    val pruned = TextDedup.ngramJaccardPairs(corpus, n = 3,
      threshold = 0.01, maxDocFreq = Some(2))
    assert(pruned.count() <= all.count())
  }

  test("keepRepresentatives keeps one doc per duplicate cluster") {
    val pairs = TextDedup.ngramJaccardPairs(corpus, n = 3, threshold = 0.5)
    val kept = TextDedup.keepRepresentatives(corpus, pairs)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L)) // 2 and 3 fold into 1; 4 survives alone
  }

  test("keepRepresentatives closes transitively (A~C, B~C, A≁B)") {
    import spark.implicits._
    val docs = Seq((1L, "da"), (2L, "db"), (3L, "dc"), (9L, "alone"))
      .toDF("doc_id", "text")
    // 1 and 2 are only connected THROUGH 3: a 1-hop min-map would keep
    // both 1 and 2; the fixpoint must keep exactly {1} plus unpaired 9
    val pairs = Seq((1L, 3L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = TextDedup.keepRepresentatives(docs, pairs)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 9L))
  }

  test("keepRepresentatives handles long chains to a single representative") {
    import spark.implicits._
    val n = 12L
    val docs = (1L to n).map(i => (i, s"d$i")).toDF("doc_id", "text")
    // chain 1~2~3~…~12 (diameter 11): exactly doc 1 survives
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val kept = TextDedup.keepRepresentatives(docs, pairs)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L))
  }

  test("duplicatedGramStats: exact per-doc counts, incl. short-doc fallback") {
    import spark.implicits._
    val c = corpus.union(Seq((5L, "ab cd")).toDF("doc_id", "text"))
    val got = TextDedup.duplicatedGramStats(c, n = 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("dup_grams"),
          r.getAs[Double]("dup_fraction")))).toMap
    // docs 1,2 identical (10 distinct trigrams, every one shared)
    assert(got(1L) == ((10L, 10L, 1.0)))
    assert(got(2L) == ((10L, 10L, 1.0)))
    // doc 3 differs in one word: the 3 trigrams covering it are unique
    assert(got(3L) == ((10L, 7L, 0.7)))
    // unrelated doc shares nothing
    assert(got(4L)._2 == 0L && got(4L)._3 == 0.0)
    // 2-token doc: whole-text fallback gram, unshared
    assert(got(5L) == ((1L, 0L, 0.0)))
  }

  test("containment catches the quoted-whole pair Jaccard misses") {
    import spark.implicits._
    // doc 20 is doc 10's text quoted VERBATIM inside much longer text:
    // every one of the short doc's grams is shared, so containment =
    // 1.0 — while Jaccard = |short| / |long| stays low
    val short0 = "the quick brown fox jumps over the lazy dog"
    val filler = (1 to 40).map(i => s"filler$i").mkString(" ")
    val c = Seq(
      (10L, short0),
      (20L, s"$filler $short0 $filler"),
      (30L, "completely unrelated content about query engines"))
      .toDF("doc_id", "text")
    val cont = TextDedup.containmentPairs(c, n = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2))).toSeq
    assert(cont == Seq((10L, 20L, 1.0)), cont.toString)
    // the same pair under Jaccard at the same bar: nothing
    val jac = TextDedup.ngramJaccardPairs(c, n = 3, threshold = 0.9)
    assert(jac.isEmpty)
    // and containment is a superset of Jaccard at equal thresholds:
    // J(A,B) = s/(na+nb-s) <= s/min(na,nb) = C(A,B)
    val jAll = TextDedup.ngramJaccardPairs(c, n = 3, threshold = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cAll = TextDedup.containmentPairs(c, n = 3, threshold = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jAll.subsetOf(cAll))
  }
}
