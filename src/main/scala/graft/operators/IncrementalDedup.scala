package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.plans.expressions.minhashSignature

/** Incremental corpus deduplication — the shape a production
  * training-data pipeline actually runs: the historical corpus is
  * represented by a SLIM persisted signature index (one row per doc:
  * id, exact-dup digest, MinHash signature — ~1 KB/doc instead of the
  * document body), and each NEW ingest batch is admitted against it:
  *
  *   1. exact layer — md5 digest equi-join batch × index;
  *   2. near layer — LSH band keys of the batch signatures joined
  *      against band keys of the index (batch side broadcast: the big
  *      index streams MAP-SIDE, zero corpus shuffle) plus a batch
  *      self-join for within-batch dups;
  *   3. verify — candidate pairs (≪ corpus) rejoin the TEXTS (corpus
  *      point-fetch by id + the batch itself) and keep true shingle
  *      Jaccard ≥ threshold. An index-only deployment can instead
  *      verify on signature agreement (estimate of J) and skip the
  *      text fetch entirely; true-J verification is the exact,
  *      oracle-checkable form.
  *
  * Admitted (novel) docs' index rows then APPEND to the index table —
  * the index grows O(corpus), each batch pays O(batch × bands) join
  * rows, and the corpus text is only ever touched for candidates.
  * Ids must be globally unique across corpus and batches.
  *
  * Scale: at 100 TB corpus / 1 TB daily batch, the only corpus-wide
  * work is the map-side band probe of the index (slim rows) and the
  * candidate text fetch (id-keyed join against the lake table, which
  * manifest Bloom/bounds pruning narrows to the files holding the
  * candidate ids). Nothing ever shuffles the corpus bodies.
  */
object IncrementalDedup {

  /** Signature-index rows for a document set: `(id, text_md5, sig)`.
    * Append these to the index table for every admitted batch. */
  def buildIndex(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", k: Int = 128, shingleSize: Int = 3,
      seed: Long = 42L): DataFrame =
    docs.select(
      col(idCol).as("id"),
      md5(col(textCol)).as("text_md5"),
      minhashSignature(
        transform(TextDedup.shingles(col(textCol), shingleSize),
          s => xxhash64(s)), k, seed).as("sig"))

  /** LSH band keys of an index: `(id, band, band_hash)` — the join-key
    * view used for candidate generation. */
  def bandKeys(index: DataFrame, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, s"bands ($bands) must divide k ($k)")
    val r = k / bands
    index.select(col("id"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"), col("sig"))
      .withColumn("band_hash",
        xxhash64(col("band"),
          concat_ws(",", slice(col("sig"), col("band") * r + 1, lit(r)))))
      .select("id", "band", "band_hash")
  }

  /** Admission manifest for `batch` against the historical `index`
    * (with `corpus` providing candidate texts for verification):
    * one row per batch doc — `(doc_id, dup_of, kind)` where `kind` is
    * `exact` (identical text, digest match), `near` (shingle Jaccard ≥
    * `threshold`), or `novel` (`dup_of` NULL). `dup_of` is the SMALLEST
    * matching id among corpus matches and earlier (lower-id) batch
    * matches — deterministic, and `exact` wins over `near` for the
    * same id.
    *
    * `eager` (default): the batch signature/shingle temporaries are
    * persisted for the DAG's multiple references, the manifest is
    * materialized (localCheckpoint — O(batch) slim rows), and the
    * temporaries are unpersisted before returning — a long-lived
    * session leaks nothing. `eager = false` returns a fully lazy plan
    * and persists NOTHING: the temporaries are recomputed per
    * reference (bounded by the batch, never the corpus).
    *
    * `broadcastBatch` (default true): hint-broadcast the batch's slim
    * join sides (digests; band keys) so the big index streams map-side
    * with ZERO corpus shuffle — right whenever the batch's band keys
    * fit the broadcast ceiling (~8 GB / 512M rows: batch × bands rows
    * of ~24 bytes, so roughly ≤ 10⁷-doc batches at 32 bands). For a
    * larger batch (a 1 TB daily ingest is ~10⁸–10⁹ band rows) pass
    * `false`: both layers fall back to plain hash-partitioned
    * equi-joins — the corpus still only shuffles its SLIM index rows
    * (id + digest / band keys), never document bodies. Same contract
    * and results either way; only the physical join strategy changes. */
  def admit(index: DataFrame, corpus: DataFrame, batch: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      k: Int = 128, bands: Int = 32, shingleSize: Int = 3,
      threshold: Double = 0.5, seed: Long = 42L,
      eager: Boolean = true, broadcastBatch: Boolean = true): DataFrame = {
    def keep(df: DataFrame): DataFrame =
      if (eager) df.persist(StorageLevel.MEMORY_AND_DISK) else df
    def hinted(df: DataFrame): DataFrame =
      if (broadcastBatch) broadcast(df) else df
    val batchIdx = keep(buildIndex(batch, textCol, idCol, k, shingleSize,
      seed))
    val batchSh = keep(batch.select(col(idCol).as("id"),
      TextDedup.shingles(col(textCol), shingleSize).as("sh")))

    // ---- exact layer: digest joins (batch digests broadcast if gated in)
    val exactCorpus = index
      .select(col("id").as("dup_of"), col("text_md5"))
      .join(hinted(batchIdx.select(col("id"), col("text_md5"))),
        Seq("text_md5"))
      .select(col("id"), col("dup_of"))
    val md = batchIdx.select(col("id"), col("text_md5"))
    val exactBatch = md
      .join(md.select(col("id").as("dup_of"),
        col("text_md5")), Seq("text_md5"))
      .where(col("dup_of") < col("id"))
      .select(col("id"), col("dup_of"))

    // ---- near layer: LSH candidates. The INDEX side is the corpus —
    // broadcast the batch band keys (when gated in) so it streams
    // map-side; otherwise a plain shuffled equi-join of slim band keys.
    val bb = bandKeys(batchIdx, k, bands)
    val candCorpus = bandKeys(index, k, bands)
      .select(col("id").as("dup_of"), col("band"), col("band_hash"))
      .join(hinted(bb), Seq("band", "band_hash"))
      .select(col("id"), col("dup_of"))
    val candBatch = bb
      .join(bb.select(col("id").as("dup_of"), col("band"),
        col("band_hash")), Seq("band", "band_hash"))
      .where(col("dup_of") < col("id"))
      .select(col("id"), col("dup_of"))
    val candidates = candCorpus.unionByName(candBatch).distinct()

    // ---- verify candidates on true shingle Jaccard (texts fetched by
    // id: corpus lookup + the batch's own shingles). Semi-join the
    // corpus down to CANDIDATE ids before shingling — tokenize/shingle
    // cost is then ∝ candidates, not corpus (on a lake-table corpus the
    // id semi-join also manifest-prunes which files are read at all)
    val candIds = candidates.select(col("dup_of")).distinct()
    val dupSh = corpus
      .join(candIds.withColumnRenamed("dup_of", idCol), Seq(idCol),
        "left_semi")
      .select(col(idCol).as("dup_of"),
        TextDedup.shingles(col(textCol), shingleSize).as("sh_b"))
      .unionByName(batchSh.select(col("id").as("dup_of"),
        col("sh").as("sh_b")))
    val near = candidates
      .join(dupSh, Seq("dup_of"))
      .join(batchSh.select(col("id"), col("sh").as("sh_a")), Seq("id"))
      .withColumn("__j",
        size(array_intersect(col("sh_a"), col("sh_b"))) /
          greatest(size(array_union(col("sh_a"), col("sh_b"))), lit(1))
            .cast("double"))
      .where(col("__j") >= threshold)
      .select(col("id"), col("dup_of"))

    // ---- resolve: smallest dup_of wins; exact beats near on ties
    val matches = near.withColumn("ex", lit(0))
      .unionByName(exactCorpus.withColumn("ex", lit(1)))
      .unionByName(exactBatch.withColumn("ex", lit(1)))
    val best = matches
      .groupBy(col("id"))
      .agg(min(struct(col("dup_of"), (lit(1) - col("ex")).as("pref")))
        .as("m"))
      .select(col("id").as("doc_id"), col("m.dup_of").as("dup_of"),
        when(col("m.pref") === 0, lit("exact")).otherwise(lit("near"))
          .as("kind"))
    val novel = batch.select(col(idCol).as("doc_id"))
      .join(best.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .withColumn("dup_of", lit(null).cast("long"))
      .withColumn("kind", lit("novel"))
    val out = best.unionByName(novel)
    if (!eager) out
    else {
      // materialize (cuts lineage), then drop the cached temporaries —
      // nothing stays pinned in the session's block manager
      val mat = out.localCheckpoint(true)
      batchIdx.unpersist(false)
      batchSh.unpersist(false)
      mat
    }
  }
}
