package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SequencePackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("spans tile the token stream exactly, splitting long docs") {
    // token counts: doc 1 -> 3, doc 2 -> 5, doc 3 -> 4; L = 4
    // stream:  [1,1,1 | 2] [2,2,2,2] [3,3,3,3]
    val docs = Seq(
      (1L, "a b c"),
      (2L, "d e f g h"),
      (3L, "i j k l")
    ).toDF("doc_id", "text")
    val got = SequencePacking.pack(docs, seqLen = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set(
      (1L, 0L, 0L, 3L), // doc 1 fully in seq 0
      (2L, 0L, 0L, 1L), // doc 2 starts in seq 0 (1 token fits)
      (2L, 1L, 1L, 4L), // ...and fills seq 1
      (3L, 2L, 0L, 4L)  // doc 3 exactly fills seq 2
    ), got.toString)
  }

  test("properties: spans conserve tokens, never overlap, fill sequences") {
    val docs = (1L to 500L)
      .map(i => (i, (1L to (i % 17 + 1)).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val L = 32L
    val spans = SequencePacking.pack(docs, seqLen = L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val totalTokens = (1L to 500L).map(_ % 17 + 1).sum
    assert(spans.map(_._4).sum == totalTokens)
    // per doc: spans are contiguous from 0 over consecutive sequences
    spans.groupBy(_._1).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_._2)
      assert(sorted.head._3 == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._2 == a._2 + 1 && b._3 == a._3 + a._4)
        case _ =>
      }
    }
    // per sequence: spans sum to exactly L (except the last sequence)
    val bySeq = spans.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (s, tot) =>
      if (s != lastSeq) assert(tot == L, s"seq $s holds $tot")
      else assert(tot <= L)
    }
  }
}
