package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): score every raw-corpus document by how much it
  * looks like a TARGET domain sample, using hashed token features so
  * the feature space is a fixed small number of buckets regardless of
  * vocabulary size. Documents are then kept by sampling proportional
  * to exp(weight) — here we produce the per-document log importance
  * weight, the expensive distributed part; the resampling itself is a
  * one-line follow-up (e.g. [[Mixture]]-style hash thresholding).
  *
  * weight(doc) = Σ_tokens ln( q(bucket(tk)) / p(bucket(tk)) )
  * with p = bucket distribution of the raw corpus, q = of the target
  * sample, both Laplace-smoothed: (c+1)/(N+B).
  *
  * Scale: both distributions are B-row aggregates (B = `nBuckets`,
  * hundreds — NOT vocabulary-sized), broadcast back; the per-document
  * sum is a map-side join + one grouped agg over (doc, token) pairs.
  * The raw corpus is never shuffled by anything wider than its own
  * doc ids; the target sample only feeds a tiny aggregate. At 100 TB
  * this is two scans and one reduce — the cheapest corpus-vs-corpus
  * comparison shape there is. */
object Dsir {

  /** Portable token→bucket hash: low 32 bits of md5, mod `nBuckets`
    * (the same expression is replayable in any engine with md5). */
  private def bucket(tk: org.apache.spark.sql.Column, nBuckets: Int) =
    conv(substring(md5(tk), 1, 8), 16, 10).cast("long") % nBuckets

  private def tokens(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df.select(col(idCol),
        explode(split(lower(col(textCol)), "\\s+")).as("tk"))
      .where(col("tk") =!= "")

  /** Per-document log importance weights of `corpus` toward `target`
    * (a sample of the domain you want more of — both DataFrames carry
    * `textCol`; `target` needs no id). Output: (id, n_tokens, weight)
    * with weight rounded to 4 decimals. */
  def importanceWeights(corpus: DataFrame, target: DataFrame,
      idCol: String, textCol: String, nBuckets: Int = 64): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val rawTok = tokens(corpus, idCol, textCol)
      .withColumn("b", bucket(col("tk"), nBuckets))
    val tgtTok = tokens(target.select(lit(0L).as("__tid"),
        col(textCol)), "__tid", textCol)
      .withColumn("b", bucket(col("tk"), nBuckets))

    def dist(tok: DataFrame, probCol: String): DataFrame = {
      val counts = tok.groupBy(col("b")).agg(count(lit(1)).as("__c"))
      val total = counts.agg(sum(col("__c")).as("__n"))
      counts.crossJoin(broadcast(total))
        .select(col("b"),
          ((col("__c") + 1).cast("double") /
            (col("__n") + nBuckets)).as(probCol))
    }

    // left joins + a smoothed default handle buckets absent from one
    // side; totals ride along via the broadcast rows
    val p = dist(rawTok, "__p")
    val q = dist(tgtTok, "__q")
    val pN = rawTok.agg(count(lit(1)).as("__pn"))
    val qN = tgtTok.agg(count(lit(1)).as("__qn"))
    rawTok
      .join(broadcast(p), Seq("b"), "left")
      .join(broadcast(q), Seq("b"), "left")
      .crossJoin(broadcast(pN)).crossJoin(broadcast(qN))
      .select(col(idCol),
        log(coalesce(col("__q"),
              lit(1.0) / (col("__qn") + nBuckets)) /
            coalesce(col("__p"),
              lit(1.0) / (col("__pn") + nBuckets))).as("__lw"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("__lw")), 4).as("weight"))
  }
}
