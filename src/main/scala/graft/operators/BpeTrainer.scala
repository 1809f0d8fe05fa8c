package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) merge training — Sennrich et
  * al. 2016 (arXiv:1508.07909), the subword-tokenizer training step of
  * every modern LM pipeline, in its scalable formulation:
  *
  *   - the CORPUS is scanned exactly once, into a (word type → count)
  *     vocabulary table — the only thing whose size matters afterward
  *     is the number of word TYPES, not corpus tokens;
  *   - each of the `numMerges` iterations is ONE distributed aggregate
  *     over that vocabulary (adjacent-symbol-pair counts weighted by
  *     word frequency), a 1-row argmax collect (count desc, pair asc —
  *     deterministic), and a map-side re-segmentation of the vocab
  *     applying the winning merge greedily left-to-right;
  *   - the evolving segmentation column is `localCheckpoint`ed every
  *     iteration so plan depth stays flat (the same fixpoint hygiene
  *     as the dedup connected-components loop).
  *
  * At 100 TB the vocabulary is millions of rows — executor-trivial —
  * and each iteration's shuffle carries pair-count partials only.
  * Training never collects anything row-shaped: only the single
  * winning pair per iteration comes to the driver.
  *
  * [[segmentWord]] applies a learned merge list to one word (pure
  * Scala — the spec oracle and the driver-side tokenizer seed); a
  * production corpus encoder would compile the merge list into a
  * native expression the same way the corpus signals do. */
object BpeTrainer {

  /** One greedy left-to-right application of merge (a, b) to a symbol
    * array, as a Catalyst fold — no UDF, stays codegen-friendly. */
  private def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms,
      array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 &&
            element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1),
            array(concat(element_at(acc, -1), x))))
          .otherwise(concat(acc, array(x))))

  /** Train `numMerges` merges; stops early when the best remaining
    * pair occurs fewer than `minPairCount` times. Returns merges in
    * learned order. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      minPairCount: Long = 2L): Seq[(String, String)] = {
    require(numMerges >= 0)
    // corpus → word-type vocabulary, one pass; initial segmentation =
    // characters with the word-end marker on the last symbol (the
    // paper's formulation: merges cannot cross word boundaries)
    var vocab = docs
      .select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .select(col("n"),
        transform(
          sequence(lit(1), length(col("w"))),
          i => when(i === length(col("w")),
            concat(col("w").substr(i, lit(1)), lit("</w>")))
            .otherwise(col("w").substr(i, lit(1)))).as("syms"))
      .localCheckpoint()

    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      // adjacent pairs straight from the symbol array — map-side
      // explode, never a corpus-wide window
      val pairs = vocab
        .where(size(col("syms")) >= 2)
        .select(col("n"),
          explode(transform(sequence(lit(1), size(col("syms")) - 1),
            j => struct(element_at(col("syms"), j).as("a"),
              element_at(col("syms"), j + 1).as("b")))).as("pr"))
        .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
        .agg(sum(col("n")).as("c"))
        .orderBy(col("c").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (pairs.isEmpty || pairs.head.getLong(2) < minPairCount)
        exhausted = true
      else {
        val (a, b) = (pairs.head.getString(0), pairs.head.getString(1))
        merges += ((a, b))
        vocab = vocab
          .select(col("n"), applyMerge(col("syms"), a, b).as("syms"))
          .localCheckpoint()
        i += 1
      }
    }
    merges.toSeq
  }

  /** Apply a learned merge list to one word (greedy left-to-right per
    * merge, merges in learned order) — the reference implementation
    * the spec checks the distributed trainer against. */
  def segmentWord(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms: Vector[String] = word.toLowerCase(java.util.Locale.ROOT).map(_.toString).toVector
      match {
        case init :+ last => init :+ (last + "</w>")
        case empty => empty
      }
    merges.foreach { case (a, b) =>
      syms = syms.foldLeft(Vector.empty[String]) { (v, x) =>
        if (v.nonEmpty && v.last == a && x == b)
          v.init :+ (v.last + x)
        else v :+ x
      }
    }
    syms
  }
}
