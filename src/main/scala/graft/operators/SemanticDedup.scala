package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.expressions.cosine

/** Semantic (embedding-space) deduplication — the SemDeDup shape: a
  * coarse k-means quantizer partitions the corpus into clusters, exact
  * pairwise cosine runs ONLY within a cluster, and of every
  * near-duplicate pair one member is dropped. The cluster step is what
  * makes the quadratic pairwise stage tractable: candidates are bounded
  * by the largest cluster, never the corpus.
  *
  * Keep rule (deterministic, engine-portable): a vector survives iff no
  * LOWER-id vector in its cluster is near-duplicate to it (rounded
  * cosine ≥ `threshold`) — the greedy keep-first sweep in id order,
  * the same convention as [[TextDedup.exact]]'s keep-lowest. The id
  * order is storage order, uncorrelated with embedding position, so
  * this is the paper's "keep one random member per duplicate group"
  * with a reproducible tiebreak.
  *
  * Scale shape: centroids are the `nCentroids` lowest-id vectors
  * (optionally refined with [[SimilaritySearch.trainCentroids]] —
  * deterministic spherical k-means, one bounded aggregation per pass),
  * inlined as a LITERAL so cluster assignment is pure map-side math —
  * the corpus is never shuffled for assignment. The within-cluster
  * self-join shuffles each row once on its cluster id; expected
  * per-cluster pair count is (|corpus|/nCentroids)²/2, so nCentroids
  * must GROW with the corpus (|corpus|/targetClusterSize) exactly like
  * [[SimilaritySearch.adaptivePlanes]] bounds LSH buckets. The inlined
  * literal stays plan-friendly to ~10³ centroids; past that (10⁸+
  * vectors) assignment becomes a broadcast join against a centroid
  * table and the probe math is unchanged — same plan shape, different
  * small-side vehicle.
  */
object SemanticDedup {

  /** Survivors after within-cluster near-duplicate dropping:
    * `(idCol, centroid_id)` — one row per KEPT vector. */
  def dedup(corpus: DataFrame, nCentroids: Int = 16,
      threshold: Double = 0.2, idCol: String = "vec_id",
      vecCol: String = "embedding", trainIterations: Int = 0): DataFrame = {
    require(nCentroids >= 1 && trainIterations >= 0)
    val c = corpus.select(col(idCol).as("__id"), col(vecCol).as("__vec"))

    // id-sampled seeds (TakeOrdered + bounded driver collect), exactly
    // the ivfTopK quantizer so the correctness oracle can replay it
    val seeds = c.orderBy("__id").limit(nCentroids).collect()
      .zipWithIndex.map { case (r, i) => (i + 1) -> r.getSeq[Float](1) }.toSeq
    val centLit = SimilaritySearch.centroidLiteral(
      if (trainIterations == 0) seeds
      else SimilaritySearch.trainCentroids(
        c.select(col("__id").as("corpus_id"), col("__vec").as("corpus_vec")),
        seeds, trainIterations))

    val assigned = c.withColumn("centroid_id",
      SimilaritySearch.nearestCentroid(centLit, col("__vec")))

    // within-cluster near-dup pairs, oriented low-id → high-id; the
    // high-id side of any pair is dropped (greedy keep-first in id
    // order). Rounded cosine on BOTH sides of the gate keeps the
    // threshold decision identical across engines.
    val a = assigned.select(col("centroid_id"), col("__id").as("id_a"),
      col("__vec").as("vec_a"))
    val b = assigned.select(col("centroid_id"), col("__id").as("id_b"),
      col("__vec").as("vec_b"))
    val dropped = a.join(b, Seq("centroid_id"))
      .where(col("id_a") < col("id_b"))
      .where(round(cosine(col("vec_a"), col("vec_b")), 6) >= threshold)
      .select(col("id_b").as("__id")).distinct()

    assigned.join(dropped, Seq("__id"), "left_anti")
      .select(col("__id").as(idCol), col("centroid_id"))
  }
}
