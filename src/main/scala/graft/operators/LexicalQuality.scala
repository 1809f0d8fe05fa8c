package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-statistics quality signals that need TWO passes — a corpus
  * aggregate (vocabulary, token frequencies) joined back per document.
  * Complements the per-row signals in `graft.functions.TextFunctions`
  * (length/punct/stopword heuristics are one-pass; these measure each
  * document AGAINST the corpus).
  *
  * Scale: tokenization is per-row; the corpus side is one (token →
  * count) aggregate — bounded by VOCABULARY, not corpus size — and
  * joins back either as a broadcast (top-K vocab) or a map-side-
  * combinable token join. No driver materialization of anything
  * row-shaped. */
object LexicalQuality {

  /** (id, token) pairs: lowercased, whitespace-split, empties dropped
    * (a leading/trailing space yields an empty split cell). */
  private def tokens(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df.select(col(idCol),
        explode(split(lower(col(textCol)), "\\s+")).as("tk"))
      .where(col("tk") =!= "")

  /** Out-of-vocabulary rate per document against the corpus's own
    * top-`vocabSize` tokens (count desc, token asc — deterministic).
    * The standard cheap proxy for "is this document lexically normal
    * for the corpus": boilerplate and foreign-language intrusions
    * score high. Output: (id, n_tokens, n_oov, oov_rate). */
  def oovRate(df: DataFrame, idCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    val tok = tokens(df, idCol, textCol)
    val vocab = tok.groupBy(col("tk")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("tk").asc).limit(vocabSize)
      .select(col("tk"), lit(1).as("__in_vocab"))
    tok.join(broadcast(vocab), Seq("tk"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_tokens"), 6))
  }

  /** Mean unigram log-likelihood per document under the corpus's OWN
    * unigram model — the self-trained stand-in for the KenLM perplexity
    * filter (CCNet-style): documents made of globally rare tokens score
    * low. score = avg over tokens of ln(count(token)/total_tokens),
    * rounded to 4 decimals (float summation order is engine-dependent
    * in the last ulp). Output: (id, n_tokens, logprob). */
  def unigramLogProb(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val tok = tokens(df, idCol, textCol)
    val freq = tok.groupBy(col("tk")).agg(count(lit(1)).as("__c"))
    val total = freq.agg(sum(col("__c")).as("__total"))
    tok.join(freq, Seq("tk"))
      .crossJoin(broadcast(total))
      .select(col(idCol),
        log(col("__c").cast("double") / col("__total")).as("__lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(col("__lp")), 4).as("logprob"))
  }
}
