package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination screening for training corpora: score each
  * candidate training document by the fraction of its distinct word
  * n-grams that also appear anywhere in a benchmark/eval set — the
  * standard pre-training decontamination gate (an n-gram-overlap test,
  * the method GPT-3/C4-style pipelines document).
  *
  * Scale shape: both sides reduce to DISTINCT 64-bit gram hashes before
  * any join (shuffles 8-byte keys, never text). The benchmark side is a
  * deduplicated gram set — benchmarks are small (10³–10⁶ examples), so
  * it broadcasts and the corpus side never shuffles at all; for an
  * unusually large benchmark pass `broadcastBenchmark = false` to fall
  * back to a hash-partitioned join. Per-document scoring is a single
  * groupBy on doc id. */
object Contamination {

  /** Per-document contamination: `(id, n_grams, n_hits, score)` for
    * every corpus document, where `score = n_hits / n_grams` over the
    * document's DISTINCT `n`-gram shingles ([[TextDedup.shingles]]
    * semantics, including the short-document whole-text fallback). */
  def score(corpus: DataFrame, benchmark: DataFrame,
      textCol: String = "text", idCol: String = "doc_id", n: Int = 3,
      broadcastBenchmark: Boolean = true): DataFrame = {
    val corpusGrams = corpus.select(col(idCol).as("id"),
        explode(TextDedup.shingles(col(textCol), n)).as("g"))
      .select(col("id"), xxhash64(col("g")).as("gram"))
    val benchGrams0 = benchmark
      .select(explode(TextDedup.shingles(col(textCol), n)).as("g"))
      .select(xxhash64(col("g")).as("gram")).distinct()
      .withColumn("__hit", lit(1))
    val benchGrams =
      if (broadcastBenchmark) broadcast(benchGrams0) else benchGrams0
    corpusGrams
      .join(benchGrams, Seq("gram"), "left")
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_grams"),
        count(col("__hit")).as("n_hits"))
      .withColumn("score",
        round(col("n_hits") / col("n_grams").cast("double"), 4))
  }
}
