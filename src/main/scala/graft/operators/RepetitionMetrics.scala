package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    // ONE tokenizing pass per row (graft_repetition_stats): token and
    // bigram identity are exact (interned ids / packed id pairs), so
    // the ratios match the SQL-oracle formulation bit-for-bit — with
    // zero shuffled (doc, token) rows and no materialized token arrays
    // (the previous shape: 4 token-array recomputations + an
    // explode→groupBy²→join for the top token)
    val st = graft.plans.expressions.repetitionStats(col(textCol))
    docs.select(col(idCol), st.as("__s"))
      .select(col(idCol),
        col("__s.n_tokens").as("n_tokens"),
        when(col("__s.n_tokens") > 0,
          round(col("__s.n_distinct") /
            col("__s.n_tokens").cast("double"), 4)).otherwise(0.0)
          .as("type_token_ratio"),
        when(col("__s.n_tokens") > 0,
          round(col("__s.top_count") /
            col("__s.n_tokens").cast("double"), 4)).otherwise(0.0)
          .as("top_word_frac"),
        when(col("__s.n_bigrams") > 0,
          round((col("__s.n_bigrams") - col("__s.n_distinct_bigrams")) /
            col("__s.n_bigrams").cast("double"), 4)).otherwise(0.0)
          .as("dup_bigram_frac"))
  }
}
