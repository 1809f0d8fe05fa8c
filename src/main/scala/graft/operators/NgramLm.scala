package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Self-trained bigram language-model scoring — the next step up from
  * [[LexicalQuality.unigramLogProb]] toward the CCNet/KenLM perplexity
  * filter: a document's fluency is measured by how predictable each
  * token is GIVEN its predecessor under the corpus's own bigram
  * statistics. Word-salad and boilerplate that passes a unigram filter
  * (common words, weird order) scores low here.
  *
  * Model: p(w2 | w1) = c(w1,w2) / c(w1,·) with counts from the scored
  * corpus itself, so every observed bigram has nonzero probability and
  * no smoothing is needed (a held-out variant would add add-k).
  *
  * Scale: tokenization and bigram formation are per-row (the only
  * window is per-document over token position — partitions bounded by
  * document length, never corpus-wide). The bigram table is one
  * (w1,w2) → count aggregate, bounded by VOCABULARY², in practice by
  * observed-bigram count — the word-count shuffle shape, map-side
  * combinable. Scoring joins corpus bigrams to that table on (w1,w2):
  * a shuffle join both sides of which are already partitioned by the
  * same key. Nothing is collected to the driver. */
object NgramLm {

  /** (id, pos, tk): lowercased whitespace tokens with their position,
    * empties dropped (adjacency is over the FILTERED sequence). */
  private def tokens(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df.select(col(idCol),
        posexplode(split(lower(col(textCol)), "\\s+")).as(Seq("pos", "tk")))
      .where(col("tk") =!= "")

  /** Mean bigram conditional log-likelihood per document plus the
    * corresponding perplexity. Output: (id, n_bigrams, logprob, ppl)
    * with logprob = avg ln p(w2|w1) rounded to 4 decimals and
    * ppl = exp(-logprob) rounded to 4 (both engines round AFTER the
    * same arithmetic). Documents with fewer than two tokens drop out
    * (they have no bigrams to score). */
  def bigramLogProb(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val tok = tokens(df, idCol, textCol)
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val big = tok
      .select(col(idCol), col("tk").as("w1"),
        lead(col("tk"), 1).over(byDoc).as("w2"))
      .where(col("w2").isNotNull)
    val c12 = big.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("__c12"))
    val c1 = c12.groupBy(col("w1"))
      .agg(sum(col("__c12")).cast("double").as("__c1"))
    big.join(c12, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .select(col(idCol),
        log(col("__c12").cast("double") / col("__c1")).as("__lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("__lp")), 4).as("logprob"),
        round(exp(-avg(col("__lp"))), 4).as("ppl"))
  }
}
