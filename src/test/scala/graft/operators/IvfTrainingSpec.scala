package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The id-correlated-corpus failure mode of naive IVF seeding:
  * first-N centroid seeds are fine on shuffled fixtures but degrade on
  * a corpus whose ids correlate with embedding position (time-ordered
  * ingest, sorted exports — the 100-TB norm). The dominant symptom is
  * CELL IMBALANCE (whole foreign clusters funnel into single cells, so
  * per-query candidate cost balloons); recall degrades when clusters
  * split across cells. Trained mode (md5-order seed sample + Lloyd
  * refinement) must fix the balance and never reduce recall, measured
  * against exact brute force on the SAME corpus. */
class IvfTrainingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val K = 5
  private val Dim = 8
  private val ClusterSize = 100

  /** Four orthogonal clusters (centers = basis vectors e0..e3), ids
    * assigned IN CLUSTER ORDER so the lowest-N ids all sit in cluster
    * 0 — adversarial for first-N seeding by construction. Jitter is a
    * deterministic hash of the id (no RNG — reproducible). */
  private lazy val corpus: DataFrame = {
    val rows = for {
      cluster <- 0 until 4
      i <- 0 until ClusterSize
    } yield {
      val id = (cluster * ClusterSize + i).toLong
      // splitmix64-style mixing: a linear-congruential jitter is
      // secretly an arithmetic progression in (id, d) — structured
      // enough to funnel whole clusters into one cell and accidentally
      // rescue first-N seeding; signed, properly mixed noise scatters
      // foreign-cluster assignments the way a real corpus would
      def mix(x: Long): Long = {
        var z = x + 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z ^ (z >>> 31)
      }
      val v = Array.tabulate(Dim) { d =>
        val h = (mix(id * 8 + d) % 1000L) / 5000.0
        (if (d == cluster * 2) 1.0 else h).toFloat
      }
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      (id, v.map(_ / norm).toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  /** One query per cluster (a mid-cluster row each), far from every
    * seed id. */
  private lazy val queries: DataFrame = corpus
    .where($"vec_id" % ClusterSize === 50)
    .select($"vec_id".as("query_id"), $"embedding")

  private def recallAt(k: Int, approx: DataFrame,
      exact: DataFrame, nq: Long): Double = {
    val hits = approx.select($"query_id", $"corpus_id")
      .join(exact.select($"query_id", $"corpus_id"),
        Seq("query_id", "corpus_id")).count()
    hits.toDouble / (k * nq)
  }

  test("trained IVF fixes the cell imbalance first-N seeding creates") {
    // The 100-TB failure of naive seeding is CANDIDATE COST, not
    // (only) recall: when every seed sits in cluster 0, each foreign
    // cluster funnels WHOLE into the one cell whose seed-jitter best
    // aligns with its axis — recall survives (the cluster stays
    // together) but a probed cell now holds multiple entire clusters,
    // and per-query re-rank cost ∝ probed cell size. Trained seeds
    // (md5 draw + Lloyd) converge one-or-more cells onto each real
    // cluster and the max cell shrinks to ~cluster size.
    val c = corpus.select($"vec_id".as("corpus_id"),
      $"embedding".as("corpus_vec"))
    def seedsOf(src: DataFrame) = src.limit(8).collect().zipWithIndex
      .map { case (r, i) => (i + 1) -> r.getSeq[Float](1) }.toSeq
    def cellSizes(cents: Seq[(Int, Seq[Float])]): Seq[Long] =
      c.withColumn("cid", SimilaritySearch.nearestCentroid(
          SimilaritySearch.centroidLiteral(cents), $"corpus_vec"))
        .groupBy("cid").count().collect().map(_.getLong(1)).toSeq
    val firstN = seedsOf(c.orderBy("corpus_id"))
    val hashed = seedsOf(c.orderBy(md5($"corpus_id".cast("string")),
      $"corpus_id"))
    val maxU = cellSizes(firstN).max
    val maxT = cellSizes(
      SimilaritySearch.trainCentroids(c, hashed, 4)).max
    info(s"max cell size: first-N seeds=$maxU trained=$maxT " +
      s"(ideal=${ClusterSize})")
    // first-N: a visibly fat cell (deterministic fixture value: 142)
    assert(maxU >= (1.3 * ClusterSize).toLong,
      s"fixture not adversarial enough: max first-N cell $maxU")
    // trained: cells converge onto the clusters (deterministic: 100,
    // i.e. EXACTLY one cluster per occupied cell)
    assert(maxT <= (1.1 * ClusterSize).toLong,
      s"trained max cell $maxT still unbalanced")
    assert(maxT < maxU)
  }

  test("trained IVF recall >= untrained on the id-correlated corpus") {
    val nq = queries.count()
    val exact = SimilaritySearch.bruteForceTopK(corpus, queries, K)
    val untrained = SimilaritySearch.ivfTopK(corpus, queries, K,
      nCentroids = 8, nProbe = 2)
    val trained = SimilaritySearch.ivfTopK(corpus, queries, K,
      nCentroids = 8, nProbe = 2, trainIterations = 4)
    val rU = recallAt(K, untrained, exact, nq)
    val rT = recallAt(K, trained, exact, nq)
    info(f"recall@$K untrained=$rU%.3f trained=$rT%.3f")
    assert(rT >= 0.95, f"trained recall $rT%.3f below 0.95")
    assert(rT >= rU, "training reduced recall on the structured corpus")
  }

  test("trained IVF matches untrained on an uncorrelated corpus") {
    // ids shuffled (md5 relabel): first-N is a fair draw here, so
    // training must not HURT — both sit near exact
    val relabeled = corpus.withColumn("vec_id",
      abs(hash($"vec_id".cast("string"))).cast("long"))
    val q2 = relabeled.orderBy("vec_id").limit(4)
      .select($"vec_id".as("query_id"), $"embedding")
    val nq = q2.count()
    val exact = SimilaritySearch.bruteForceTopK(relabeled, q2, K)
    val trained = SimilaritySearch.ivfTopK(relabeled, q2, K,
      nCentroids = 8, nProbe = 2, trainIterations = 2)
    val rT = recallAt(K, trained, exact, nq)
    info(f"recall@$K trained(shuffled ids)=$rT%.3f")
    assert(rT >= 0.9, f"trained recall $rT%.3f below 0.9 on fair ids")
  }
}
