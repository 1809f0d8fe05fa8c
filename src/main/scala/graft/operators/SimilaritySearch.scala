package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.expressions.{cosine, hyperplaneSignature}

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, matching a large-scale training-data pipeline:
  *   - [[bruteForceTopK]] — exact cosine top-k, the correctness baseline.
  *     Queries are broadcast (they're the small side by construction);
  *     each executor streams its corpus partition once through the
  *     codegen'd [[graft.plans.expressions.CosineSimilarity]] loop and a
  *     per-query top-k window. Cost: O(|corpus|·|queries|·dim), embarrassingly
  *     parallel, zero corpus shuffle.
  *   - [[lshTopK]] — the scale path: random-hyperplane LSH buckets both
  *     sides, candidates = same-bucket pairs, exact cosine re-rank within
  *     the bucket. Sub-linear candidate count; recall tunable via
  *     `nPlanes` (fewer planes = bigger buckets = higher recall, more
  *     compute). An IVF variant would swap the signature for a learned
  *     coarse quantizer — same join shape.
  */
object SimilaritySearch {

  /** Effective hyperplane count for an LSH bucketing over `corpusSize`
    * vectors: at least `minPlanes`, grown so the EXPECTED bucket size
    * stays ≤ `targetBucketSize` —
    * `max(minPlanes, ceil(log2(corpusSize / targetBucketSize)))`, capped
    * at 62 (the signature is a long bitset).
    *
    * This is the embedding analogue of the n-gram stop-gram guard
    * (TextDedup maxDocFreq): with a STATIC plane count, per-bucket
    * self-join candidates grow as n²/2^planes — fine at 5k vectors, a
    * scale-killer at 10⁹ (a hot bucket ≈ 10¹⁵ pairs). Deriving planes
    * from the corpus size bounds expected candidates per bucket at
    * ~targetBucketSize²/2 no matter how the corpus grows; recall is
    * traded explicitly (more planes = finer buckets), exactly like every
    * production single-probe LSH. */
  def adaptivePlanes(corpusSize: Long, minPlanes: Int,
      targetBucketSize: Long): Int = {
    require(minPlanes >= 1 && targetBucketSize >= 1)
    val buckets = // ceil(corpusSize / targetBucketSize)
      (math.max(corpusSize, 1L) + targetBucketSize - 1) / targetBucketSize
    val needed = // ceil(log2(buckets)); 0 when one bucket suffices
      if (buckets <= 1L) 0
      else 64 - java.lang.Long.numberOfLeadingZeros(buckets - 1L)
    math.min(62, math.max(minPlanes, needed))
  }

  /** Int8 scalar quantization of an embedding column — the 4× memory
    * compression a 100 TB ANN corpus runs on: per-vector `scaleCol` =
    * max|x| / 127 and `codesCol` = ⌊x / scale + 0.5⌋ ∈ [−127, 127]
    * (deterministic floor(+0.5) rounding, mirrored exactly by the SQL
    * oracle). Cosine is SCALE-INVARIANT, so similarity search runs
    * directly on the integer codes — no dequantization in the scoring
    * loop, and dot products over ±127 codes stay exactly representable
    * in float; `scaleCol` is kept for value reconstruction. All
    * per-row array math (codegen'd higher-order functions), zero
    * shuffle. */
  def quantizeInt8(df: DataFrame, vecCol: String = "embedding",
      codesCol: String = "q_codes",
      scaleCol: String = "q_scale"): DataFrame = {
    val v = col(vecCol)
    val mx = aggregate(
      transform(v, x => abs(x.cast("double"))), lit(0d),
      (acc, x) => greatest(acc, x))
    df.withColumn(scaleCol, mx / lit(127d))
      .withColumn(codesCol,
        when(col(scaleCol) === 0d, transform(v, _ => lit(0)))
          .otherwise(transform(v, x =>
            floor(x.cast("double") / col(scaleCol) + lit(0.5d))
              .cast("int"))))
  }

  /** Exact top-k over int8-QUANTIZED vectors: quantize both sides, then
    * the brute-force cosine loop runs on the codes (scale-invariance —
    * see [[quantizeInt8]]). The accuracy/4×-memory trade, with the same
    * broadcast-queries / zero-corpus-shuffle plan as
    * [[bruteForceTopK]]. */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdCol: String = "query_id"): DataFrame = {
    def codes(df: DataFrame, id: String) =
      quantizeInt8(df, vecCol)
        .select(col(id), col("q_codes").cast("array<float>").as(vecCol))
    bruteForceTopK(codes(corpus, idCol), codes(queries, queryIdCol), k,
      idCol, vecCol, queryIdCol)
  }

  /** Exact top-k: for each query vector, the k most-cosine-similar corpus
    * vectors. Deterministic tie-break on corpus id.
    *
    * Broadcast bound: the hint is on the QUERY side, which is small by
    * construction (a search request batch — 10³–10⁵ vectors, well
    * under the ~8 GB/512M-row ceiling; 10⁵ × 64-dim float32 ≈ 26 MB).
    * A query set past that is not a search workload but an all-pairs
    * join — use [[cosineNearDupPairs]]'s bucketed shape instead. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdCol: String = "query_id"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"),
      col(vecCol).as("corpus_vec"))
    val q = queries.select(col(queryIdCol), col(vecCol).as("query_vec"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("score", cosine(col("corpus_vec"), col("query_vec")))
    val w = Window.partitionBy(queryIdCol)
      .orderBy(col("score").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryIdCol), col("rank"), col("corpus_id"),
        round(col("score"), 6).as("score"))
  }

  /** Approximate top-k via random-hyperplane LSH bucketing: join on the
    * exact signature match, re-rank within buckets. Queries landing in a
    * sparse bucket return < k rows — the standard single-probe trade-off.
    *
    * `probeHamming = 1` enables MULTI-PROBE: each query additionally
    * probes every bucket at hamming distance 1 from its own signature
    * (the `planes` single-bit flips) — the standard recall recovery for
    * near-boundary vectors, at (planes+1)× the candidate join keys. Only
    * the QUERY side fans out (it is the broadcast side by construction);
    * the corpus still carries exactly one signature per vector, so each
    * (query, corpus) candidate pair appears at most once.
    *
    * `nPlanes` is a MINIMUM: the effective plane count grows with the
    * corpus via [[adaptivePlanes]] so per-bucket candidate counts stay
    * bounded at any scale (one cheap count-star over the corpus, paid
    * once per call). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nPlanes: Int = 12, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdCol: String = "query_id",
      targetBucketSize: Long = 4096L,
      probeHamming: Int = 0): DataFrame = {
    require(probeHamming >= 0 && probeHamming <= 1,
      "probeHamming 0 (single-probe) or 1 (flip each plane) supported")
    val planes = adaptivePlanes(corpus.count(), nPlanes, targetBucketSize)
    val c = corpus.select(col(idCol).as("corpus_id"),
        col(vecCol).as("corpus_vec"))
      .withColumn("bucket", hyperplaneSignature(col("corpus_vec"), planes, seed))
    val q0 = queries.select(col(queryIdCol), col(vecCol).as("query_vec"))
      .withColumn("sig", hyperplaneSignature(col("query_vec"), planes, seed))
    val q =
      if (probeHamming == 0) q0.withColumn("bucket", col("sig")).drop("sig")
      else q0.withColumn("bucket",
          explode(array((col("sig") +: (0 until planes).map(b =>
            col("sig").bitwiseXOR(lit(1L << b)))): _*)))
        .drop("sig")
    val scored = c.join(broadcast(q), Seq("bucket"))
      .withColumn("score", cosine(col("corpus_vec"), col("query_vec")))
    val w = Window.partitionBy(queryIdCol)
      .orderBy(col("score").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryIdCol), col("rank"), col("corpus_id"),
        round(col("score"), 6).as("score"))
  }

  /** IVF (inverted-file) approximate top-k: a coarse quantizer assigns
    * every corpus vector to its nearest of `nCentroids` centroid vectors;
    * queries probe their `nProbe` nearest centroids and re-rank exactly
    * within those inverted lists.
    *
    * Untrained (`trainIterations = 0`, the default): centroids are the
    * `nCentroids` lowest-id corpus vectors — exactly reproducible in
    * plain SQL (the correctness oracle). Trained: seeds are drawn in
    * deterministic md5-of-id order (a uniform sample even when ids
    * correlate with embedding position) and refined with that many
    * spherical-k-means passes ([[trainCentroids]]) — the production
    * path for clustered corpora, where first-N seeding collapses
    * recall (IvfTrainingSpec measures the gap).
    *
    * Scale shape: centroids are collected once (tiny — a driver-side
    * manifest-scale list) and inlined as a LITERAL array, so both the
    * corpus assignment and the query probe are pure map-side
    * `transform`/`array_max` over broadcast-free projections — the corpus
    * is NEVER shuffled or duplicated for assignment. The only wide
    * operations are the broadcast candidate join and the final per-query
    * top-k window over |corpus| · nProbe / nCentroids candidate rows.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCentroids: Int = 16, nProbe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdCol: String = "query_id", trainIterations: Int = 0): DataFrame = {
    require(nProbe >= 1 && nProbe <= nCentroids)
    require(trainIterations >= 0)
    val c = corpus.select(col(idCol).as("corpus_id"),
      col(vecCol).as("corpus_vec"))
    // TakeOrdered (no global sort), then a 16-row driver collect.
    // Untrained mode seeds with the lowest-id rows (exactly SQL-
    // replayable — the correctness oracle); trained mode seeds by
    // DETERMINISTIC HASH order instead: on a corpus whose ids
    // correlate with embedding position (time-ordered ingest, sorted
    // exports — the 100-TB norm, not the exception), the first-N draw
    // lands every seed in one region and recall collapses; the
    // md5-order draw is a uniform sample whatever the id layout.
    val seedSrc =
      if (trainIterations == 0) c.orderBy("corpus_id")
      else c.orderBy(md5(col("corpus_id").cast("string")),
        col("corpus_id"))
    val centroidRows = seedSrc.limit(nCentroids).collect()
    val seeds = centroidRows.zipWithIndex.map { case (r, i) =>
      (i + 1) -> r.getSeq[Float](1)
    }.toSeq
    val centLit = centroidLiteral(
      if (trainIterations == 0) seeds
      else trainCentroids(c, seeds, trainIterations))

    val assigned = c.withColumn("centroid_id",
      nearestCentroid(centLit, col("corpus_vec")))

    // nProbe nearest centroids per query, map-side: sort by (negsim, id)
    // ascending → nearest first, ties to the lowest id; slice, explode
    val q = queries.select(col(queryIdCol), col(vecCol).as("query_vec"))
    val probes = q.withColumn("centroid_id",
        explode(slice(
          transform(
            array_sort(transform(centLit, cs =>
              struct((-cosine(col("query_vec"), cs.getField("vec")))
                .as("negsim"), cs.getField("id").as("id")))),
            s => s.getField("id")),
          1, nProbe)))
      .select(col("centroid_id"), col(queryIdCol), col("query_vec"))

    // exact re-rank within the probed inverted lists
    val wRank = Window.partitionBy(queryIdCol)
      .orderBy(col("score").desc, col("corpus_id").asc)
    assigned.join(broadcast(probes), Seq("centroid_id"))
      .withColumn("score", cosine(col("corpus_vec"), col("query_vec")))
      .withColumn("rank", row_number().over(wRank))
      .where(col("rank") <= k)
      .select(col(queryIdCol), col("rank"), col("corpus_id"),
        round(col("score"), 6).as("score"))
  }

  /** (id, vector) centroids → the inlined literal array both the
    * assignment and the probe `transform` over (zero shuffle). */
  private[operators] def centroidLiteral(cents: Seq[(Int, Seq[Float])]): Column =
    array(cents.map { case (id, v) =>
      struct(lit(id).as("id"), typedLit(v).as("vec"))
    }: _*)

  /** Nearest centroid, map-side: argmax cosine via array_max over a
    * struct whose lexicographic order is (sim asc, -id asc) → max =
    * highest sim, ties to the lowest centroid id. */
  private[operators] def nearestCentroid(centLit: Column, vec: Column): Column =
    -array_max(transform(centLit, cs =>
      struct(cosine(vec, cs.getField("vec")).as("sim"),
        (-cs.getField("id")).as("negid")))).getField("negid")

  /** Nearest codeword by squared L2 (PQ's sub-slice metric), map-side:
    * argmin via array_min over a struct ordered (dist asc, id asc). */
  private[operators] def nearestCodewordL2(centLit: Column,
      vec: Column): Column =
    array_min(transform(centLit, cs =>
      struct(
        aggregate(zip_with(vec, cs.getField("vec"),
            (x, y) => (x.cast("double") - y.cast("double")) *
              (x.cast("double") - y.cast("double"))),
          lit(0.0), _ + _).as("d"),
        cs.getField("id").as("id")))).getField("id")

  /** Lloyd refinement of the id-sampled seed centroids — the k-means
    * training a production IVF/PQ runs over the same pipeline
    * (k-means|| initialization collapses to the fixed seed draw here so
    * runs are reproducible; the iteration count is fixed, not
    * convergence-tested, for the same reason). `spherical = true` is
    * IVF's cosine flavor: nearest-by-cosine assignment, re-normalized
    * means. `spherical = false` is PQ's codebook flavor: nearest-by-L2
    * assignment, plain means (sub-slices aren't unit vectors, so
    * normalizing would distort them).
    *
    * Scale shape: each iteration is ONE distributed aggregation — the
    * map side assigns every vector to its nearest centroid (the same
    * inlined-literal argmax as the query path, zero shuffle) and
    * partially aggregates per-dimension sums, so the shuffle carries
    * only tasks × centroids × dim partial rows, never vectors. A
    * cluster that loses all members keeps its previous centroid, the
    * standard empty-cluster fallback.
    *
    * Every updated component is ROUNDED to 6 decimals (the mean, and
    * for spherical the normalized value again): a distributed avg's
    * summation order is nondeterministic, so unrounded centroids
    * differ by ulps run-to-run (and engine-to-engine) — rounding makes
    * the whole training loop REPLAYABLE (same clusters every run, and
    * a SQL oracle can replay it step for step). Float32 centroids hold
    * ~7 significant digits anyway, so the quantization costs nothing. */
  private[operators] def trainCentroids(c: DataFrame,
      seeds: Seq[(Int, Seq[Float])], iters: Int,
      spherical: Boolean = true): Seq[(Int, Seq[Float])] = {
    def r6(v: Double): Double = BigDecimal(v)
      .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    var cents = seeds
    (1 to iters).foreach { _ =>
      val centLit = centroidLiteral(cents)
      val assigned =
        if (spherical) nearestCentroid(centLit, col("corpus_vec"))
        else nearestCodewordL2(centLit, col("corpus_vec"))
      val means = c
        .withColumn("centroid_id", assigned)
        .select(col("centroid_id"),
          posexplode(col("corpus_vec")).as(Seq("pos", "x")))
        .groupBy("centroid_id", "pos").agg(avg(col("x")).as("m"))
        .collect()
        .groupBy(_.getInt(0))
      cents = cents.map { case (id, old) =>
        means.get(id) match {
          case Some(rows) =>
            val vec = rows.sortBy(_.getInt(1)).map(r => r6(r.getDouble(2)))
            if (!spherical) id -> vec.map(_.toFloat).toSeq
            else {
              // norm over the ROUNDED means in dimension order — the
              // exact fold a SQL replay computes
              val norm = math.sqrt(vec.map(x => x * x).sum)
              if (norm == 0.0) id -> old
              else id -> vec.map(x => r6(x / norm).toFloat).toSeq
            }
          case None => id -> old // empty cluster keeps its centroid
        }
      }
    }
    cents
  }

  /** Product-quantization (PQ) approximate top-k — the MEMORY scale
    * path: the vector dimension splits into `nSubspaces` blocks, each
    * block gets a tiny per-block codebook (`nCodes` codewords), and
    * every corpus vector is ENCODED as just its per-block codeword ids
    * — `nSubspaces` small ints instead of `dim` floats (64-dim float32
    * → 4 bytes: a 25 TB embedding column fits executor memory as a
    * ~1.6 TB code column). Queries score candidates with ADC
    * (asymmetric distance computation): the approximate inner product
    * is the sum over blocks of query-subvector · codeword — the query
    * side stays exact, only the corpus is quantized.
    *
    * Codebooks are id-sampled exactly like [[ivfTopK]]'s centroids
    * (the `nCodes` lowest-id vectors' sub-slices — reproducible in
    * plain SQL, which is what the correctness oracle replays);
    * codeword assignment is argmin squared-L2 per block, ties to the
    * lowest codeword id. All double math in a FIXED fold order so the
    * oracle's arithmetic is bit-identical. `trainIterations > 0`
    * Lloyd-refines each subspace's codebook ([[trainCentroids]] with
    * `spherical = false` — L2 assignment, plain means) for tighter
    * cells at the cost of nSubspaces × iters aggregation jobs; the
    * default 0 keeps the oracle-reproducible codebook.
    *
    * Scale shape: the codebook is a driver-side literal
    * (nSubspaces × nCodes × dim/nSubspaces floats — KBs); encoding is
    * pure map-side `transform` math, zero corpus shuffle, and the
    * scored candidate set is corpus × broadcast queries exactly like
    * [[bruteForceTopK]] but at ~nSubspaces lookups per pair instead of
    * `dim` multiplies. A production variant composes with [[ivfTopK]]
    * (IVF-PQ): coarse cells bound the candidates, PQ codes pay the
    * per-candidate cost; same plan shape. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nSubspaces: Int = 4, nCodes: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdCol: String = "query_id",
      trainIterations: Int = 0): DataFrame = {
    require(trainIterations >= 0)
    val c = corpus.select(col(idCol).as("corpus_id"),
      col(vecCol).as("corpus_vec"))
    val (cbLit, sub) = pqCodebookLiteral(c, nSubspaces, nCodes,
      trainIterations)

    val encoded = pqEncode(c, cbLit, nSubspaces, nCodes, sub)

    // ADC scoring: exact query subvectors against quantized corpus
    // (query side broadcast — same request-batch bound as
    // bruteForceTopK: searches carry 10³–10⁵ queries, megabytes)
    val q = queries.select(col(queryIdCol), toD(col(vecCol)).as("__qd"))
    val scored = encoded.crossJoin(broadcast(q))
      .withColumn("score", adcScore(cbLit, nSubspaces, sub))
    val w = Window.partitionBy(queryIdCol)
      .orderBy(round(col("score"), 6).desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryIdCol), col("rank"), col("corpus_id"),
        round(col("score"), 6).as("score"))
  }

  private def toD(v: Column) = transform(v, x => x.cast("double"))
  private def sqDist(a: Column, b: Column) = aggregate(
    zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)
  private def inner(a: Column, b: Column) = aggregate(
    zip_with(a, b, (x, y) => x * y), lit(0.0), _ + _)

  /** Per-subspace codebooks as an inlined literal (see [[pqTopK]]):
    * codebook(m)(j) = j-th codeword of subspace m, seeded from the
    * `nCodes` lowest-id vectors' sub-slices, Lloyd-refined when
    * `trainIterations > 0`. Returns (literal, subspace width). */
  private def pqCodebookLiteral(c: DataFrame, nSubspaces: Int,
      nCodes: Int, trainIterations: Int): (Column, Int) = {
    val seedRows = c.orderBy("corpus_id").limit(nCodes).collect()
    require(seedRows.nonEmpty, "empty corpus")
    val dim = seedRows.head.getSeq[Float](1).size
    require(dim % nSubspaces == 0,
      s"dim $dim not divisible into $nSubspaces subspaces")
    val sub = dim / nSubspaces
    val codebooks: Seq[Seq[Seq[Double]]] = (0 until nSubspaces).map { m =>
      val seeds = seedRows.zipWithIndex.map { case (r, j) =>
        (j + 1) -> r.getSeq[Float](1).slice(m * sub, (m + 1) * sub)
      }.toSeq
      val cb =
        if (trainIterations == 0) seeds
        else trainCentroids(
          c.select(col("corpus_id"),
            slice(col("corpus_vec"), m * sub + 1, sub).as("corpus_vec")),
          seeds, trainIterations, spherical = false)
      cb.sortBy(_._1).map(_._2.map(_.toDouble).toSeq)
    }
    (array(codebooks.map(cb =>
      array(cb.map(cw => typedLit(cw)): _*)): _*), sub)
  }

  /** Map-side PQ encoding: code(m) = argmin_j ||x_m − c_{m,j}||²,
    * 1-based, ties to the lowest codeword id. Keeps every non-vector
    * column of `c` (so an IVF cell id rides along). */
  private def pqEncode(c: DataFrame, cbLit: Column, nSubspaces: Int,
      nCodes: Int, sub: Int): DataFrame =
    c.withColumn("__vd", toD(col("corpus_vec")))
      .withColumn("code",
        transform(sequence(lit(1), lit(nSubspaces)), m =>
          array_min(transform(sequence(lit(1), lit(nCodes)), j =>
            struct(
              sqDist(slice(col("__vd"), (m - lit(1)) * sub + lit(1), lit(sub)),
                element_at(element_at(cbLit, m), j)).as("d"),
              j.as("j")))).getField("j")))
      .drop("__vd", "corpus_vec")

  /** ADC score of a `__qd` query column against a `code` column, in a
    * FIXED fold order (subspace 1..n) so the SQL oracle's arithmetic
    * is bit-identical. */
  private def adcScore(cbLit: Column, nSubspaces: Int,
      sub: Int): Column =
    aggregate(sequence(lit(1), lit(nSubspaces)), lit(0.0), (acc, m) =>
      acc + inner(
        slice(col("__qd"), (m - lit(1)) * sub + lit(1), lit(sub)),
        element_at(element_at(cbLit, m),
          element_at(col("code"), m))))

  /** IVF-PQ — the two scale paths COMPOSED, the FAISS "IVFADC" layout
    * every billion-vector deployment runs (Jégou et al., "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011, §IV): the
    * coarse quantizer bounds WHICH candidates a query pays for
    * (|corpus| · nProbe / nCentroids), PQ codes bound WHAT each
    * candidate costs (nSubspaces lookups, 4 bytes of corpus memory).
    * This variant quantizes raw vectors, not cell residuals — the
    * add-on the non-residual layout trades for reusing one codebook
    * across cells (and for plain-SQL oracle replay).
    *
    * Scale shape: centroids AND codebooks are driver-side literals
    * (KBs); assignment + encoding are one map-side pass over the
    * corpus — never shuffled, never duplicated; the candidate join is
    * corpus ⋈ broadcast(probes) on the cell id, so each executor
    * streams only its own cells' codes. The final window ranks
    * |corpus| · nProbe / nCentroids rows per query, the same bound as
    * [[ivfTopK]] at ~nSubspaces/dim of the arithmetic. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4,
      nSubspaces: Int = 4, nCodes: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdCol: String = "query_id",
      trainIterations: Int = 0): DataFrame = {
    require(nProbe >= 1 && nProbe <= nCentroids)
    val c = corpus.select(col(idCol).as("corpus_id"),
      col(vecCol).as("corpus_vec"))
    val centroidRows = c.orderBy("corpus_id").limit(nCentroids).collect()
    val seeds = centroidRows.zipWithIndex.map { case (r, i) =>
      (i + 1) -> r.getSeq[Float](1)
    }.toSeq
    val centLit = centroidLiteral(
      if (trainIterations == 0) seeds
      else trainCentroids(c, seeds, trainIterations))
    val (cbLit, sub) = pqCodebookLiteral(c, nSubspaces, nCodes,
      trainIterations)

    // one map-side pass: cell assignment + PQ encoding together
    val encoded = pqEncode(
      c.withColumn("centroid_id",
        nearestCentroid(centLit, col("corpus_vec"))),
      cbLit, nSubspaces, nCodes, sub)

    // nProbe nearest cells per query (same probe expr as ivfTopK)
    val q = queries.select(col(queryIdCol), col(vecCol).as("query_vec"))
    val probes = q.withColumn("centroid_id",
        explode(slice(
          transform(
            array_sort(transform(centLit, cs =>
              struct((-cosine(col("query_vec"), cs.getField("vec")))
                .as("negsim"), cs.getField("id").as("id")))),
            s => s.getField("id")),
          1, nProbe)))
      .select(col("centroid_id"), col(queryIdCol),
        toD(col("query_vec")).as("__qd"))

    val scored = encoded.join(broadcast(probes), Seq("centroid_id"))
      .withColumn("score", adcScore(cbLit, nSubspaces, sub))
    val w = Window.partitionBy(queryIdCol)
      .orderBy(round(col("score"), 6).desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryIdCol), col("rank"), col("corpus_id"),
        round(col("score"), 6).as("score"))
  }

  /** Embedding-cosine near-duplicate pairs: LSH-bucket the corpus against
    * itself, exact cosine within buckets, keep pairs ≥ `threshold`.
    * `nPlanes` is a MINIMUM — the effective count grows with the corpus
    * via [[adaptivePlanes]], bounding the per-bucket self-join candidate
    * count (≈ targetBucketSize²/2) at any corpus size. */
  def cosineNearDupPairs(corpus: DataFrame, threshold: Double = 0.95,
      nPlanes: Int = 12, seed: Long = 42L, idCol: String = "vec_id",
      vecCol: String = "embedding",
      targetBucketSize: Long = 4096L): DataFrame = {
    val planes = adaptivePlanes(corpus.count(), nPlanes, targetBucketSize)
    val sigs = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("bucket", hyperplaneSignature(col("vec"), planes, seed))
    val a = sigs.select(col("bucket"), col("id").as("id_a"),
      col("vec").as("vec_a"))
    val b = sigs.select(col("bucket"), col("id").as("id_b"),
      col("vec").as("vec_b"))
    a.join(b, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .withColumn("score", round(cosine(col("vec_a"), col("vec_b")), 6))
      .where(col("score") >= threshold)
      .select("id_a", "id_b", "score")
  }
}
