package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class IncrementalDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "pack my box with five dozen liquor jugs and then pack " +
      "another box with five dozen liquor jugs again"),
    (4L, "sphinx of black quartz judge my vow")
  ).toDF("doc_id", "text")

  private val batch = Seq(
    // exact dup of corpus doc 1
    (10L, "the quick brown fox jumps over the lazy dog"),
    // near dup of corpus doc 2 (one word changed: J = 15/21 ≈ 0.71)
    (11L, "pack my box with nine dozen liquor jugs and then pack " +
      "another box with five dozen liquor jugs again"),
    // novel
    (12L, "a completely different sentence about distributed query engines"),
    // exact dup of batch doc 12 (within-batch, later id)
    (13L, "a completely different sentence about distributed query engines")
  ).toDF("doc_id", "text")

  test("admission manifest: exact / near / novel / within-batch") {
    val index = IncrementalDedup.buildIndex(corpus)
    val got = IncrementalDedup.admit(index, corpus, batch)
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2)))
      .toSet
    assert(got == Set(
      (10L, 1L, "exact"),
      (11L, 2L, "near"),
      (12L, -1L, "novel"),
      (13L, 12L, "exact")))
  }

  test("exact beats near when the same doc matches both ways") {
    // batch doc identical to corpus doc 1 AND near-dup of corpus doc 2:
    // dup_of is the smallest matching id; kind follows that id
    val b = Seq((20L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val index = IncrementalDedup.buildIndex(corpus)
    val r = IncrementalDedup.admit(index, corpus, b).collect().head
    assert(r.getLong(0) == 20L && r.getLong(1) == 1L &&
      r.getString(2) == "exact")
  }

  test("broadcastBatch=false: same manifest, zero broadcast hints") {
    val index = IncrementalDedup.buildIndex(corpus)
    val hintedRows = IncrementalDedup.admit(index, corpus, batch)
      .collect().map(_.toSeq).toSet
    val plain = IncrementalDedup.admit(index, corpus, batch,
      eager = false, broadcastBatch = false)
    // identical admission decisions through the hash-join fallback
    assert(plain.collect().map(_.toSeq).toSet == hintedRows)
    // and the gate really removed the hints from the plan
    assert(!plain.queryExecution.analyzed.toString.contains("ResolvedHint"))
    val hintedPlan = IncrementalDedup.admit(index, corpus, batch,
      eager = false)
    assert(hintedPlan.queryExecution.analyzed.toString
      .contains("ResolvedHint"))
  }

  test("admitted novel rows extend the index for the next batch") {
    val index0 = IncrementalDedup.buildIndex(corpus)
    val manifest = IncrementalDedup.admit(index0, corpus, batch)
    val novelIds = manifest.where($"kind" === "novel")
      .select("doc_id").as[Long].collect().toSet
    val index1 = index0.unionByName(IncrementalDedup.buildIndex(
      batch.where($"doc_id".isin(novelIds.toSeq: _*))))
    // the next batch repeats doc 12's text: now a dup of indexed 12
    val b2 = Seq(
      (30L, "a completely different sentence about distributed query engines")
    ).toDF("doc_id", "text")
    val corpus1 = corpus.unionByName(
      batch.where($"doc_id".isin(novelIds.toSeq: _*)))
    val r = IncrementalDedup.admit(index1, corpus1, b2).collect().head
    assert(r.getLong(0) == 30L && r.getLong(1) == 12L &&
      r.getString(2) == "exact")
  }
}
