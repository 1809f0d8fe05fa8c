package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

import graft.functions.TextFunctions

/** Gopher-style intra-document repetition signals — the quality
  * filters a pre-training pipeline runs to drop degenerate/boilerplate
  * text (Rae et al. 2021 §A1.1: duplicate-n-gram and top-token
  * fractions):
  *
  *   - `type_token_ratio`  distinct/total tokens (low = repetitive)
  *   - `top_word_frac`     occurrences of the most frequent token /
  *                         total (high = degenerate)
  *   - `dup_bigram_frac`   repeated-bigram occurrence fraction
  *
  * Scale shape: the array metrics are pure per-row column math
  * (codegen'd, zero shuffle); only the top-token count needs an
  * explode + two-level aggregation, keyed on (doc, token) then doc —
  * both map-side combinable, shuffle rows bounded by the vocabulary per
  * document, not text size. */
object RepetitionMetrics {

  def compute(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    // raw (non-distinct) bigrams; guarded — sequence(0, -1) would count
    // backwards, not return empty
    val bigrams = when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => concat_ws(" ", slice(toks, i + 1, lit(2)))))
      .otherwise(array().cast(ArrayType(StringType)))
    val perDoc = docs.select(col(idCol),
      size(toks).as("__nt"),
      size(array_distinct(toks)).as("__dt"),
      size(bigrams).as("__nb"),
      size(array_distinct(bigrams)).as("__db"))
    val top = docs
      .select(col(idCol), explode(toks).as("__tok"))
      .groupBy(col(idCol), col("__tok")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(max(col("__c")).as("__mx"), sum(col("__c")).as("__tot"))
    perDoc.join(top, Seq(idCol), "left")
      .select(col(idCol),
        col("__nt").cast("long").as("n_tokens"),
        when(col("__nt") > 0, round(col("__dt") /
          col("__nt").cast("double"), 4)).otherwise(0.0)
          .as("type_token_ratio"),
        coalesce(when(col("__tot") > 0, round(col("__mx") /
          col("__tot").cast("double"), 4)), lit(0.0))
          .as("top_word_frac"),
        when(col("__nb") > 0, round((col("__nb") - col("__db")) /
          col("__nb").cast("double"), 4)).otherwise(0.0)
          .as("dup_bigram_frac"))
  }
}
