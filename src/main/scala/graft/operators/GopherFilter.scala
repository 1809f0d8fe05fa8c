package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** The Gopher quality-filter RULE CASCADE (Rae et al. 2021,
  * arXiv:2112.11446 §A1.1) as one production operator: every document
  * gets a keep/drop decision plus the FIRST failing rule's name — the
  * auditable form a data-governance pipeline needs (how much did each
  * rule cost us?), not just a boolean.
  *
  * Every signal is a ratio of INTEGER counts (token counts, length
  * sums, max-count), so rule comparisons are bit-identical across
  * engines — no fp-threshold flakiness — and every signal is computed
  * MAP-SIDE in one pass: [[graft.plans.expressions.RepetitionStats]]
  * supplies the repetition counts, higher-order array functions the
  * lexical ones. Zero shuffles, zero joins; the operator composes
  * with a groupBy on `fail_reason` for the per-rule audit. */
object GopherFilter {

  /** Rule thresholds (defaults tuned for the synthetic corpus — real
    * Gopher values are minWords=50, maxWords=100000, meanWordLen
    * [3,10], symbolRatio 0.1, alphaWordFrac 0.8). */
  final case class Thresholds(
      minWords: Long = 25, maxWords: Long = 90,
      minMeanWordLen: Double = 2.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, minAlphaWordFrac: Double = 0.8,
      maxTopWordFrac: Double = 0.12, maxDupBigramFrac: Double = 0.25)

  /** Output: (id, n_tokens, keep, fail_reason) — fail_reason is the
    * FIRST failing rule in the documented order, NULL when kept. */
  def filter(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text",
      t: Thresholds = Thresholds()): DataFrame = {
    val st = graft.plans.expressions.repetitionStats(col(textCol))
    val toks = TextFunctions.tokens(col(textCol))
    val scored = docs.select(col(idCol), col(textCol), st.as("__s"),
        toks.as("__t"))
      .select(col(idCol),
        col("__s.n_tokens").as("__n"),
        // Σ token length / n — ints, division exact-identical in SQL
        aggregate(transform(col("__t"), w => length(w)), lit(0L),
          _ + _).as("__lensum"),
        (length(col(textCol)) -
          length(regexp_replace(col(textCol), "[^a-zA-Z0-9 ]", "")))
          .cast("long").as("__symbols"),
        length(col(textCol)).cast("long").as("__chars"),
        size(org.apache.spark.sql.functions.filter(col("__t"),
            w => w.rlike("[a-z]")))
          .cast("long").as("__alpha"),
        col("__s.top_count").as("__top"),
        col("__s.n_bigrams").as("__nb"),
        (col("__s.n_bigrams") - col("__s.n_distinct_bigrams"))
          .as("__dupb"))
    def ratio(num: Column, den: Column): Column =
      num.cast("double") / den.cast("double")
    val reason =
      when(col("__n") < t.minWords, "too_few_words")
        .when(col("__n") > t.maxWords, "too_many_words")
        .when(ratio(col("__lensum"), col("__n")) < t.minMeanWordLen,
          "mean_word_too_short")
        .when(ratio(col("__lensum"), col("__n")) > t.maxMeanWordLen,
          "mean_word_too_long")
        .when(ratio(col("__symbols"), greatest(col("__chars"), lit(1L)))
          > t.maxSymbolRatio, "symbol_heavy")
        .when(ratio(col("__alpha"), col("__n")) < t.minAlphaWordFrac,
          "non_alpha_words")
        .when(ratio(col("__top"), col("__n")) > t.maxTopWordFrac,
          "top_word_dominates")
        .when(col("__nb") > 0 &&
          ratio(col("__dupb"), col("__nb")) > t.maxDupBigramFrac,
          "repeated_bigrams")
    scored.select(col(idCol), col("__n").as("n_tokens"),
      reason.isNull.as("keep"), reason.as("fail_reason"))
  }
}
