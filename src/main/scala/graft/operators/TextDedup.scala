package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.plans.expressions.{minhashSignature, simhash64}

/** Document-deduplication family for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and exact n-gram Jaccard. All are pure
  * DataFrame pipelines — shuffles only on hash keys (never raw text),
  * candidate generation always via bucket joins (never an O(n²) cross
  * join), so each scales to billions of documents by partition count
  * alone.
  *
  * CACHE-RELEASE CONTRACT (applies to every persist site in this
  * family: minHashPairs' shingle frame, sharedGramPairs' gram frames,
  * duplicatedGramStats' gram frame, exactSubstringSpans' candidate
  * frame): each operator `persist()`s a shared subtree that several
  * consumers would otherwise recompute. The returned DataFrame is
  * lazy, so the operator CANNOT unpersist before the caller's action —
  * release is the CALLER's obligation: run
  * `spark.catalog.clearCache()` after consuming the result (Verify and
  * Bench do, between queries). A caller that never releases leaks only
  * spillable MEMORY_AND_DISK blocks, which cache eviction reclaims
  * under memory pressure (eviction merely recomputes) — but on a
  * long-lived session the blocks otherwise accumulate for its
  * lifetime, so release explicitly.
  */
object TextDedup {

  // --------------------------------------------------------------- exact

  /** Exact dedup: group on the 128-bit MD5 of the text (shuffling a
    * 32-char digest, not the document bodies), keep the lowest id per
    * group. `n_copies` > 1 marks duplicate clusters. */
  def exact(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_md5"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  // ------------------------------------------------------------- shingles

  /** Distinct word `n`-gram shingles of the tokenized text; a document
    * shorter than `n` tokens contributes its whole token string as one
    * shingle, so no document silently disappears.
    *
    * One fused codegen pass ([[graft.plans.expressions.WordShingles]])
    * — the previous `array_distinct(transform(sequence, slice +
    * concat_ws))` spelling allocated per-shingle slices and paid an
    * O(g²) string `array_distinct` per document (24× slower measured);
    * semantics are identical including the short/empty-doc fallback. */
  def shingles(text: Column, n: Int): Column =
    graft.plans.expressions.wordShingles(TextFunctions.tokens(text), n)

  // --------------------------------------------------------- MinHash + LSH

  /** MinHash+LSH near-duplicate pairs.
    *
    * Pipeline: shingle → xxhash64 per shingle → k-permutation MinHash
    * signature (one fused native loop, see
    * [[graft.plans.expressions.MinHashSignature]]) → band the signature
    * into `bands` groups of k/bands values → exact-match join on
    * (band, bandHash) buckets → verify candidates with the true shingle
    * Jaccard → keep pairs ≥ `threshold`.
    *
    * Scale: the only wide operations are (1) one shuffle of
    * docs×bands (id, bandHash) pairs — tiny rows — for the bucket
    * self-join, and (2) id-keyed joins back to the shingle sets for
    * verification. Identical-heavy corpora produce hot buckets; cap
    * pathological ones upstream with [[exact]] dedup first (standard
    * practice: exact-dedup, then near-dedup).
    */
  def minHashPairs(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", k: Int = 128, bands: Int = 32,
      shingleSize: Int = 3, threshold: Double = 0.7,
      seed: Long = 42L): DataFrame = {
    require(k % bands == 0, s"bands ($bands) must divide k ($k)")
    val r = k / bands

    // persisted: consumed by the signature pipeline and twice more by
    // the verification joins (see ngramJaccardPairs for the rationale)
    val withShingles = docs
      .select(col(idCol).as("id"),
        shingles(col(textCol), shingleSize).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val withSig = withShingles
      .withColumn("sig",
        minhashSignature(transform(col("sh"), s => xxhash64(s)), k, seed))

    // slim (id, band, band_hash) rows through the bucket self-join —
    // shingle arrays only rejoin per-id AFTER the candidate set is
    // deduplicated (keeps the wide rows out of the big shuffle; the two
    // join sides share one shuffle via Spark's exchange reuse)
    val bandedSig = withSig
      .select(col("id"), col("sig"))
      .withColumn("band", explode(sequence(lit(0), lit(bands - 1))))
      .withColumn("band_hash",
        xxhash64(col("band"),
          concat_ws(",", slice(col("sig"), col("band") * r + 1, lit(r)))))
      .select("id", "band", "band_hash")

    val a = bandedSig.select(col("band"), col("band_hash"),
      col("id").as("id_a"))
    val b = bandedSig.select(col("band"), col("band_hash"),
      col("id").as("id_b"))
    val candidates = a.join(b, Seq("band", "band_hash"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()

    candidates
      .join(withShingles.select(col("id").as("id_a"), col("sh").as("sh_a")),
        Seq("id_a"))
      .join(withShingles.select(col("id").as("id_b"), col("sh").as("sh_b")),
        Seq("id_b"))
      .withColumn("__j",
        size(array_intersect(col("sh_a"), col("sh_b"))) /
          greatest(size(array_union(col("sh_a"), col("sh_b"))), lit(1))
            .cast("double"))
      .where(col("__j") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("__j"), 4).as("jaccard"))
  }

  /** Connected-component "keep lowest id" reduction over near-dup pairs,
    * via min-label propagation iterated to a FIXPOINT (full transitive
    * closure: a chain A~B~C keeps only A even though A≁C directly — the
    * 1-hop shortcut would wrongly keep both A and B for edge sets like
    * {A~C, B~C}).
    *
    * Scale shape: labels live only on the nodes that appear in a pair
    * (≪ corpus for a deduped-ish corpus); each iteration is one
    * edges⋈labels shuffle + a groupBy-min, and `localCheckpoint`
    * truncates the lineage so the plan stays flat. Iterations =
    * component diameter — near-dup clusters are near-cliques, so 2–3 in
    * practice (pointer-jumping would halve rounds if ever needed). */
  def keepRepresentatives(docs: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    // persist the pair source FIRST: the undirected-edge union below
    // evaluates it twice, and for an expensive source (the ngram
    // inverted-index join) that doubles the dominant cost
    val p = pairs
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    p.count() // materialize now — the union's branches would otherwise
    // race and each compute the source before the cache fills
    val edges = p.select(col("id_a").as("x"), col("id_b").as("y"))
      .union(p.select(col("id_b").as("x"), col("id_a").as("y")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("x")).distinct()
      .withColumn("rep", col("x"))
      .localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      val viaNbr = edges
        .join(labels.select(col("x").as("y"), col("rep")), Seq("y"))
        .groupBy("x").agg(min("rep").as("nrep"))
      val updated = labels.join(viaNbr, Seq("x"), "left")
        .select(col("x"),
          least(col("rep"), coalesce(col("nrep"), col("rep"))).as("rep"))
        .localCheckpoint()
      changed = updated
        .join(labels.withColumnRenamed("rep", "old"), Seq("x"))
        .where(col("rep") < col("old")).count()
      labels = updated
    }
    // labels is localCheckpointed (materialized, lineage-free), so it
    // covers exactly the paired nodes — derive both the membership and
    // representative sets from it and release the big caches now
    val reps = labels.where(col("rep") === col("x"))
      .select(col("x").as(idCol))
    val inPairs = labels.select(col("x").as(idCol))
    p.unpersist(blocking = false)
    edges.unpersist(blocking = false)
    // unpaired docs represent themselves; paired docs survive only as
    // their component's minimum id
    docs.join(inPairs, Seq(idCol), "left_anti")
      .unionByName(docs.join(reps, Seq(idCol), "left_semi"))
  }

  // --------------------------------------------------------------- SimHash

  /** SimHash near-duplicate pairs: 64-bit signature per doc (one native
    * loop), candidates via exact match on any of four 16-bit bands
    * (pigeonhole: hamming ≤ 3 ⇒ ≥ 1 identical band), verified with
    * `bit_count(a ^ b) ≤ maxHamming` — all codegen'd built-ins. Token
    * hashing uses [[graft.plans.expressions.TokenHash64]] (poly +
    * avalanche): same mixing quality as xxhash64 for this purpose, and
    * exactly reproducible by the SQL correctness oracle. */
  def simHashPairs(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", maxHamming: Int = 3): DataFrame = {
    val sigs = docs.select(col(idCol).as("id"),
      simhash64(transform(TextFunctions.tokens(col(textCol)),
        t => graft.plans.expressions.tokenHash64(t))).as("sig"))

    // one pass: all four 16-bit band values as an array, posexplode into
    // (id, sig, band, band_val) rows — the signature is computed once per
    // doc (shiftright requires foldable shifts, hence the literal array)
    val byBand = sigs.select(col("id"), col("sig"),
        posexplode(array((0 until 4).map(p =>
          shiftright(col("sig"), p * 16).bitwiseAND(lit(0xFFFFL))): _*))
          .as(Seq("band", "band_val")))

    val a = byBand.select(col("band"), col("band_val"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val b = byBand.select(col("band"), col("band_val"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "band_val"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .where(col("hamming") <= maxHamming)
  }

  // ----------------------------------------------------- exact n-gram sets

  /** Exact n-gram Jaccard pairs via an inverted-index join — no LSH
    * approximation: explode distinct n-grams, join docs sharing a gram,
    * count shared grams per pair, Jaccard = |∩| / (|A| + |B| - |∩|).
    *
    * `maxDocFreq` prunes grams appearing in more than that many docs
    * (stop-gram pruning — the standard skew guard: a gram shared by
    * 10^5 docs would create a 10^10-row join group; dropping it loses no
    * *near-duplicate* signal since such grams carry no discriminative
    * information). Pass None for exact semantics (the DuckDB oracle
    * mirrors the pruned form when set).
    */
  def ngramJaccardPairs(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", n: Int = 3, threshold: Double = 0.5,
      maxDocFreq: Option[Int] = None): DataFrame =
    sharedGramPairs(docs, textCol, idCol, n, maxDocFreq)
      .withColumn("__j", col("shared") /
        (col("na") + col("nb") - col("shared")).cast("double"))
      .where(col("__j") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("__j"), 4).as("jaccard"))

  /** Asymmetric CONTAINMENT near-duplicate pairs (Broder's containment
    * measure): shared distinct `n`-grams over the SMALLER document's
    * gram count — `|A ∩ B| / min(|A|, |B|)`. Catches the pairs Jaccard
    * structurally cannot: a short document quoted whole inside a much
    * longer one scores containment ≈ 1.0 while its Jaccard ≈
    * |short|/|long| stays under any useful threshold. The span-level
    * admission policy ("drop docs mostly contained in an earlier doc")
    * thresholds on exactly this. Same candidate machinery and scale
    * shape as [[ngramJaccardPairs]] — 8-byte gram hashes through every
    * exchange, optional df cap against boilerplate blowup. */
  def containmentPairs(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", n: Int = 3, threshold: Double = 0.5,
      maxDocFreq: Option[Int] = None): DataFrame =
    sharedGramPairs(docs, textCol, idCol, n, maxDocFreq)
      .withColumn("__c", col("shared") /
        least(col("na"), col("nb")).cast("double"))
      .where(col("__c") >= threshold)
      .select(col("id_a"), col("id_b"),
        round(col("__c"), 4).as("containment"))

  /** Shared-distinct-gram counts per candidate pair: (id_a, id_b,
    * shared, na, nb) with id_a < id_b — the common core the Jaccard
    * and containment measures select from. */
  private def sharedGramPairs(docs: DataFrame, textCol: String,
      idCol: String, n: Int,
      maxDocFreq: Option[Int]): DataFrame = {
    // join/shuffle on the 64-bit gram hash, not the gram string: an
    // 8-byte fixed-width key through every exchange. Birthday bound:
    // ~2e-11 collision odds at a 30k-gram vocabulary, ~3% only past
    // 10^9 distinct grams — and a collision merely adds one candidate
    // pair that the per-pair Jaccard then scores honestly.
    // Persisted: three consumers (both self-join sides + per-doc counts)
    // would otherwise re-run tokenize→shingle→explode each; spillable
    // MEMORY_AND_DISK keeps this safe at any scale (eviction merely
    // recomputes).
    val grams = docs.select(col(idCol).as("id"),
        explode(shingles(col(textCol), n)).as("g"))
      .select(col("id"), xxhash64(col("g")).as("gram"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pruned = maxDocFreq match {
      case Some(m) =>
        val df = grams.groupBy("gram")
          .agg(count(lit(1)).as("df")).where(col("df") <= m)
        // persisted for the same reason as grams: three consumers
        // (per-doc counts + both self-join sides) would re-run the
        // df-filter join each
        grams.join(df.select("gram"), Seq("gram"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      case None => grams
    }
    val counts = pruned.groupBy("id").agg(count(lit(1)).as("n_grams"))

    val shared = pruned.select(col("gram"), col("id").as("id_a"))
      .join(pruned.select(col("gram"), col("id").as("id_b")), Seq("gram"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared"))

    shared
      .join(counts.select(col("id").as("id_a"), col("n_grams").as("na")),
        Seq("id_a"))
      .join(counts.select(col("id").as("id_b"), col("n_grams").as("nb")),
        Seq("id_b"))
  }

  /** Per-document duplicated-span statistics (the Gopher/Dolma
    * "fraction of text in duplicated n-grams" family, at shingle
    * granularity): for every document, how many of its DISTINCT word
    * `n`-grams also appear in at least one OTHER document, and the
    * resulting duplicate fraction — the signal span-level dedup
    * policies threshold on (docs that merely overlap boilerplate score
    * low; near-copies score ~1).
    *
    * Returns `(idCol, n_grams, dup_grams, dup_fraction)`.
    *
    * Scale shape: both wide stages move 8-byte gram hashes, never
    * text — one groupBy(gram) computing document frequency over rows
    * already distinct per doc ([[shingles]] emits a distinct array),
    * one hash join of those slim df rows back to the (id, gram) pairs
    * (1:1, no row explosion even for stop-grams), one groupBy(id).
    * Unlike the pairwise operators there is NO self-join, so no
    * hot-bucket guard is needed: cost is linear in total gram count at
    * any corpus size. */
  def duplicatedGramStats(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", n: Int = 3): DataFrame = {
    val grams = docs.select(col(idCol).as("id"),
        explode(shingles(col(textCol), n)).as("g"))
      .select(col("id"), xxhash64(col("g")).as("gram"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val df = grams.groupBy("gram").agg(count(lit(1)).as("df"))
    grams.join(df, Seq("gram"))
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("dup_grams"))
      .withColumn("dup_fraction",
        round(col("dup_grams") / col("n_grams").cast("double"), 4))
  }

  // ------------------------------------------- exact-substring (spans)

  /** EXACT-SUBSTRING dedup (the ExactSubstr policy of Lee et al. 2021,
    * "Deduplicating Training Data Makes Language Models Better"): find,
    * per document, the character SPANS whose every position sits in a
    * length-`L` substring that occurs elsewhere in the corpus — the
    * memorization-driving repeats (licenses, boilerplate, syndicated
    * paragraphs) that document-level near-dup keeps. Overlapping /
    * touching duplicated grams merge into maximal spans.
    *
    * Returns `(idCol, spans array<struct<s,e>>, n_spans, dup_chars)` —
    * one row per document that HAS duplicated spans; [[removeSpans]]
    * cuts them out of the text.
    *
    * Spark-first shape (the paper's suffix array is a single-machine
    * construction): one pass explodes each document into its
    * `len−L+1` position grams HASHED IN PLACE, so the full-corpus wide
    * stage moves only (id, pos, xxhash64) — 16 B/position, never text.
    * Duplication is decided on the hash (map-side-combinable
    * groupBy(h) count + join back), then candidates re-join their
    * document once per doc, re-extract the gram, and RE-VERIFY
    * collision-exactly — collisions cost a false candidate re-checked,
    * never a wrong span. The string verify is PER-HASH collision
    * detection, not a per-gram window: `groupBy(h, gram)` is map-side
    * combinable, so a corpus-hot boilerplate gram (one license
    * paragraph duplicated 10⁸×) collapses to one row per input
    * partition before any shuffle — it can never become a
    * one-partition window straggler. Hashes carrying a single distinct
    * gram (the overwhelmingly common case) are verified duplicates
    * outright; only COLLIDING hashes (expected ≈ corpus_grams²/2⁶⁴ —
    * near-zero by the birthday bound, and broadcast-sized by
    * construction) resolve per gram, via one broadcast left-join.
    * Candidate gram text is extracted map-side and never shuffles.
    * Span assembly is a per-document running-max island merge (window
    * over the dup positions only, ∝ duplicated content, not corpus).
    *
    * `hashSpace` is a TEST SEAM: `> 0` narrows the gram hash to
    * `pmod(xxhash64, hashSpace)` so specs can force distinct grams
    * into one bucket and pin the collision path; production callers
    * leave the default 0 (full 64-bit). */
  def exactSubstringSpans(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", L: Int = 30,
      hashSpace: Long = 0L): DataFrame = {
    require(L >= 2, s"gram length $L too short")
    // slim exploded frame: hash the gram INSIDE the lambda so the
    // full-corpus stages carry only (id, pos, hash) — 16 B/position —
    // never the gram text
    val hashOf = (sub: String) =>
      if (hashSpace > 0) s"pmod(xxhash64($sub), ${hashSpace}L)"
      else s"xxhash64($sub)"
    val slim = docs.where(length(col(textCol)) >= L)
      .select(col(idCol).as("id"), expr(
        s"""posexplode(transform(
           |  sequence(0, length($textCol) - $L),
           |  i -> ${hashOf(s"substring($textCol, i + 1, $L)")}))"""
          .stripMargin).as(Seq("pos", "h")))
    // map-side partial counts shrink the hash shuffle further
    val dupH = slim.groupBy("h").agg(count(lit(1)).as("ch"))
      .where(col("ch") > 1).select("h")
    // candidates re-join their document ONCE PER DOC (not per
    // position) and re-extract the gram string for the
    // collision-exact verify — only the DUPLICATED subset's gram
    // text ever shuffles
    // persisted shared subtree (same contract as minHashPairs — see
    // the class doc): the candidate set feeds BOTH the per-hash
    // collision aggregation and the final verify pass; without the
    // cache the corpus-wide explode + h/id shuffles would run twice
    // (the two consumers prune different columns, so exchange reuse
    // cannot dedup them). Size ∝ the duplicated subset only.
    val cand = slim.join(dupH, "h")
      .join(docs.select(col(idCol).as("id"),
        col(textCol).as("__t")), "id")
      .select(col("id"), col("pos").cast("long").as("pos"), col("h"),
        expr(s"substring(__t, pos + 1, $L)").as("gram"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Collision-exact string verify WITHOUT a per-gram window (a
    // window gets no map-side combine and no AQE skew split, so one
    // corpus-hot gram would pin a whole task). Instead: per-(h, gram)
    // occurrence counts — partial aggregation collapses a hot gram to
    // one row per input partition — then per-hash collision info. For
    // the non-colliding hashes (≈ all of them) every candidate is a
    // true duplicate (the hash-level count > 1 IS the gram's count);
    // a colliding hash carries the subset of its grams that genuinely
    // repeat in `ok_grams`. The collision table is ≈ grams²/2⁶⁴ rows —
    // tiny by the birthday bound — so the verify is one BROADCAST
    // left-join; candidate rows never shuffle again.
    val hgram = cand.groupBy("h", "gram")
      .agg(count(lit(1)).as("gc"))
    val collideInfo = hgram.groupBy("h")
      .agg(count(lit(1)).as("ng"),
        // collect_list skips nulls: only genuinely-repeating grams
        collect_list(when(col("gc") > 1, col("gram"))).as("ok_grams"))
      .where(col("ng") > 1)
      .select(col("h"), col("ok_grams"))
    val dup = cand
      .join(broadcast(collideInfo), Seq("h"), "left")
      .where(col("ok_grams").isNull ||
        array_contains(col("ok_grams"), col("gram")))
      .select(col("id"), col("pos"))
    val byDoc = Window.partitionBy("id").orderBy("pos")
    val prevEnd = max(col("pos") + L)
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val islands = dup
      .withColumn("brk",
        when(col("pos") > coalesce(prevEnd, lit(-1L)), 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(byDoc))
    islands.groupBy(col("id"), col("island"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + L).as("e"))
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e") - col("s")).as("dup_chars"),
        sort_array(collect_list(struct(col("s"), col("e"))))
          .as("spans"))
  }

  /** Cut `spans` (as produced by [[exactSubstringSpans]] — sorted,
    * non-overlapping, 0-based `[s, e)`) out of `text`: a pure
    * higher-order-function fold, no UDF — each step keeps the gap
    * before the span, the finish keeps the tail. Null spans (a
    * left-joined document with no duplicated content) pass the text
    * through unchanged. */
  def removeSpans(text: Column, spans: Column): Column = {
    val folded = aggregate(spans,
      struct(lit(0L).as("last"), lit("").as("acc")),
      (st, sp) => struct(
        sp.getField("e").as("last"),
        concat(st.getField("acc"), text.substr(
          (st.getField("last") + 1).cast("int"),
          (sp.getField("s") - st.getField("last")).cast("int")))
          .as("acc")),
      st => concat(st.getField("acc"), text.substr(
        (st.getField("last") + 1).cast("int"),
        (length(text).cast("long") - st.getField("last")).cast("int"))))
    when(spans.isNull, text).otherwise(folded)
  }
}
