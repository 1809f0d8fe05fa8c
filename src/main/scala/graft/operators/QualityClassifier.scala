package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Model-based document quality scoring — the fastText-classifier
  * pattern every production pretraining pipeline runs (CCNet's
  * wiki-vs-crawl filter, GPT-3's WebText classifier): label documents
  * with a cheap heuristic, train a linear bag-of-words classifier on
  * those labels, keep the classifier's score as the quality signal.
  * The trained form here is multinomial Naive Bayes with Laplace
  * smoothing — the classic linear baseline whose training IS one
  * aggregation, so the whole train+score cycle stays a declarative
  * two-pass plan (and is exactly reproducible in plain SQL, which is
  * what the correctness oracle does).
  *
  * Per-token log-likelihood-ratio weights:
  * `w(t) = ln((c_pos(t)+1)/(N_pos+V)) − ln((c_neg(t)+1)/(N_neg+V))`
  * over token OCCURRENCES (multinomial, multiplicity counts); document
  * score = smoothed class-prior log-odds + Σ w(token) over the
  * document's tokens; predicted label = rounded score > 0 (rounding
  * first keeps the sign decision identical across engines).
  *
  * Scale shape: pass 1 aggregates (token → per-class counts) — shuffle
  * rows are distinct tokens, bounded by vocabulary, not corpus size;
  * three scalar totals come back to the driver (N_pos, N_neg, V — a
  * bounded collect, same class as the IVF centroid seed). Pass 2 joins
  * the per-token weight table back to the exploded tokens — vocabulary
  * tables broadcast to ~10⁷ tokens; pass `broadcastVocab = false` past
  * that for a hash join on the token key — then one groupBy(doc) sums
  * the weights. The corpus text itself is never shuffled.
  */
object QualityClassifier {

  /** Train on `labelCol` (boolean: positive class) and score every
    * document: `(idCol, n_tokens, nb_score, label_pred)`. Documents
    * with zero tokens carry no evidence and are dropped (both engines
    * agree by construction of the token join). */
  def trainScore(corpus: DataFrame, labelCol: Column,
      idCol: String = "doc_id", textCol: String = "text",
      broadcastVocab: Boolean = true): DataFrame = {
    val base = corpus.select(col(idCol).as("id"),
      col(textCol).as("__text"), labelCol.cast("boolean").as("__y"))
    val tok = base.select(col("id"), col("__y"),
      explode(TextFunctions.tokens(col("__text"))).as("t"))

    // pass 1: per-token class counts + the four scalar totals
    val counts = tok.groupBy("t").agg(
      sum(when(col("__y"), 1L).otherwise(0L)).as("cpos"),
      sum(when(!col("__y"), 1L).otherwise(0L)).as("cneg"))
    val Array(totals) = counts
      .agg(sum("cpos").as("npos"), sum("cneg").as("nneg"),
        count(lit(1)).as("v")).collect()
    val (nPos, nNeg, v) =
      (totals.getLong(0), totals.getLong(1), totals.getLong(2))
    val Array(docTotals) = base.agg(
      sum(when(col("__y"), 1L).otherwise(0L)).as("dpos"),
      sum(when(!col("__y"), 1L).otherwise(0L)).as("dneg")).collect()
    // smoothed prior log-odds: defined even if one class is empty
    val prior = math.log((docTotals.getLong(0) + 1).toDouble /
      (docTotals.getLong(1) + 1).toDouble)

    val weights0 = counts.select(col("t"),
      (log((col("cpos") + 1) / lit((nPos + v).toDouble)) -
        log((col("cneg") + 1) / lit((nNeg + v).toDouble))).as("w"))
    val weights = if (broadcastVocab) broadcast(weights0) else weights0

    tok.join(weights, Seq("t"))
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("w")) + prior, 4).as("nb_score"))
      .withColumn("label_pred", col("nb_score") > 0)
  }
}
