package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import graft.plans.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data deduplication operators (SURVEY §2.4 #40–44).
  *
  * Scale design (the whole point at 100 TB):
  *  - Exact dedup projects each doc down to (doc_id, md5) before the
  *    exchange — exactly one shuffle, no text movement (plan-asserted).
  *  - MinHash-LSH is linear: each doc emits `bands` fixed-size rows
  *    (shingling stays array-local inside codegen — no shuffle of
  *    shingles); the only shuffle is on (band, signature); pairwise
  *    work happens strictly inside collision buckets (≪ n²).
  *  - Exact Jaccard / embedding-cosine verification runs only on the
  *    LSH candidate pairs, which is the standard two-phase
  *    (filter → verify) near-dup pipeline.
  *  - All hashing is md5 so the DuckDB oracle reproduces every stage
  *    bit-for-bit (SURVEY §6).
  */
object Dedup {

  val ShingleK = 8
  val NumHashes = 16
  val NumBands = 4
  val RowsPerBand: Int = NumHashes / NumBands

  /** #40 Exact dedup: md5 identity groups; keeper = min doc_id.
    *
    * The text is reduced to its 32-hex md5 *before* any exchange and
    * both window aggregates share one window spec in one select, so
    * the physical plan is: scan → project(doc_id, h) → single
    * Exchange of ~40-byte rows → one Window. No document text ever
    * moves over the wire (asserted in DedupSimilaritySpec).
    *
    * Memoized+persisted (house cache rule): [[Curation.dedupManifest]]
    * consumes this next to the other tiers, and at 100 TB the keyed
    * exact-dup relation is an intermediate a curation run materializes
    * once, not per consumer. ~30-byte rows, corpus-linear. */
  def exact(s: SparkSession, dir: String): DataFrame =
    memo(s, "exact", dir)(exactCore(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** The unpersisted plan behind [[exact]] — what the one-Exchange /
    * no-text-shuffle spec asserts on (the persist wrapper renders the
    * same plan twice in explain output, which would defeat node
    * counting). */
  private[graft] def exactCore(s: SparkSession, dir: String): DataFrame = {
    val byHash = Window.partitionBy(col("h"))
    Tables.documents(s, dir)
      .select(col("doc_id"), md5(col("text")).as("h"))
      .select(col("doc_id"),
        min(col("doc_id")).over(byHash).as("keeper"),
        count(lit(1)).over(byHash).as("n_copies"))
      .select(col("doc_id"), col("keeper"),
        (col("doc_id") =!= col("keeper")).as("is_dup"), col("n_copies"))
  }

  /** Every doc_id ≡ 0 (mod [[IncrMod]]) stands in for the NEW ingest
    * batch in [[exactIncremental]]; the rest is the existing corpus.
    * Mod 5 (distinct from Curation.BenchMod's 7) so the synthetic
    * corpus's planted exact-dup groups straddle the boundary and the
    * corpus-hit path has real rows to verify. */
  val IncrMod = 5

  /** #40b INCREMENTAL exact dedup — the nightly-ingest face of [[exact]]:
    * classify a new batch of documents against the EXISTING corpus's
    * hash index without recomputing (or even reading) the corpus text.
    * Disposition ladder: `dup_corpus` (hash already in the index —
    * wins over everything, `dup_of` names the corpus keeper),
    * `dup_batch` (first occurrence within the batch wins, same
    * min-doc_id rule as [[exact]]), else `new_unique`.
    *
    * Scale shape: the corpus side is reduced to its (h, keeper) hash
    * index — built once and persisted (house cache rule; at 100 TB
    * this is a bucketed parquet handoff like Curation.dedupTierDir,
    * APPENDED with each accepted batch rather than rebuilt). The new
    * batch is hashed map-side and joins the index on 40-byte keys;
    * corpus text is never touched, batch text never shuffles. The
    * streaming twin ([[graft.streaming.EventStreams.dedupExactStream]])
    * bounds its state by a watermark horizon; this face carries the
    * UNBOUNDED history a production ingest checks against. */
  def exactIncremental(s: SparkSession, dir: String): DataFrame = {
    val index = memo(s, "exactidx", dir)(Tables.documents(s, dir)
        .filter(col("doc_id") % IncrMod =!= 0)
        .select(md5(col("text")).as("h"), col("doc_id"))
        .groupBy(col("h")).agg(min(col("doc_id")).as("dup_of"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val batch = Tables.documents(s, dir)
      .filter(col("doc_id") % IncrMod === 0)
      .select(col("doc_id"), md5(col("text")).as("h"))
    exactIncrementalOf(batch, index)
  }

  /** Operator core over any (doc_id, h) batch and (h, dup_of) index —
    * what the planted-case spec exercises directly. */
  private[graft] def exactIncrementalOf(batch: DataFrame, index: DataFrame): DataFrame = {
    val byHash = Window.partitionBy(col("h"))
    batch
      .select(col("doc_id"), col("h"),
        min(col("doc_id")).over(byHash).as("batch_keeper"))
      .join(index, Seq("h"), "left")
      .select(col("doc_id"), col("dup_of"),
        when(col("dup_of").isNotNull, "dup_corpus")
          .when(col("doc_id") =!= col("batch_keeper"), "dup_batch")
          .otherwise("new_unique").as("disposition"))
  }

  /** #41c INCREMENTAL near-dup classification — the nightly-ingest
    * face of [[minhashLsh]], completing the [[exactIncremental]]
    * pair: classify a new batch against the EXISTING corpus's LSH
    * band index (same [[IncrMod]] split). Disposition ladder:
    * `near_corpus` (shares ≥1 band bucket with a corpus doc —
    * `near_of` names the smallest such corpus doc), `near_batch`
    * (shares a bucket with an earlier batch doc), else `new_unique`.
    *
    * Scale shape: the corpus side is reduced to its (band, sig,
    * min-doc) bucket index — at 100 TB a persisted parquet tier
    * (dedupTierDir pattern) APPENDED per accepted batch, never
    * rebuilt. Batch docs compute signatures map-side; the
    * batch-internal window and the index join share one (band, sig)
    * hash partitioning, and only ~50-byte band rows reach it —
    * corpus text is never read, batch text never shuffles. Here both
    * relations filter the one memoized [[lshBands]] pass so the
    * signature kernel runs once per process. */
  def nearIncremental(s: SparkSession, dir: String): DataFrame = {
    val bands = lshBands(s, dir)
    nearIncrementalOf(
      bands.filter(col("doc_id") % IncrMod =!= 0),
      bands.filter(col("doc_id") % IncrMod === 0))
  }

  /** Operator core over any two (doc_id, band, sig) relations —
    * classification logic only, spec'd on planted and randomized
    * bucket assignments. */
  private[graft] def nearIncrementalOf(idxBands: DataFrame, batchBands: DataFrame): DataFrame = {
    val idx = idxBands.groupBy(col("band"), col("sig"))
      .agg(min(col("doc_id")).as("corpus_min"))
    val byBucket = Window.partitionBy(col("band"), col("sig"))
    batchBands
      .withColumn("batch_min", min(col("doc_id")).over(byBucket))
      .join(idx, Seq("band", "sig"), "left")
      .groupBy(col("doc_id"))
      .agg(min(col("corpus_min")).as("near_of"), min(col("batch_min")).as("bmin"))
      .select(col("doc_id"), col("near_of"),
        when(col("near_of").isNotNull, "near_corpus")
          .when(col("bmin") < col("doc_id"), "near_batch")
          .otherwise("new_unique").as("disposition"))
  }

  val NumSalts = 4
  val ChunksPerMd5: Int = NumHashes / NumSalts

  /** (doc_id, band, band-signature) rows — the LSH bucketing relation.
    * Persisted: the self-join consumes it twice and AQE's broadcast
    * conversion defeats exchange reuse, so without a cache the whole
    * signature pipeline (the expensive md5 pass over every shingle)
    * runs twice. The relation is 4 rows × ~50 bytes per doc — at
    * 100 TB of documents this is the standard "signature index"
    * intermediate you'd materialize anyway. Memoized per sf dir so
    * repeated callers (minhash_lsh → jaccard → clusters) share one
    * persisted copy, and [[clearCaches]] can free it at pipeline end. */
  private[operators] val liveCaches =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** Cache keys carry the owning session's identity: a memoized
    * DataFrame is bound to the SparkSession that created it, so after
    * a stop/restart in the same JVM a fresh session must not receive
    * a DataFrame from the dead one. */
  private[operators] def cacheKey(s: SparkSession, tag: String, dir: String): String =
    s"$tag|${System.identityHashCode(s)}|$dir"

  /** Unpersist every memoized intermediate (end-of-pipeline hygiene —
    * Verify/Bench call this so the signature index doesn't outlive
    * the run). */
  def clearCaches(): Unit = {
    liveCaches.values.forEach(df => { df.unpersist(); () })
    liveCaches.clear()
  }

  /** HOUSE MEMO — the only sanctioned way to CREATE a liveCaches
    * entry: get → build → putIfAbsent, never `computeIfAbsent`. A
    * builder that (transitively) reaches another memoized builder
    * nests `computeIfAbsent` on the same ConcurrentHashMap, and that
    * throws `IllegalStateException("Recursive update")` whenever the
    * two keys land in one hash bin. Bin placement depends on
    * `System.identityHashCode(session)` inside [[cacheKey]], so the
    * crash is per-JVM-run roulette: in round 16 Verify, the full
    * test suite, and the quiet bench all passed while the driver's
    * bench died on eval_confusion (whose builder reaches nbGrid's
    * memo). The non-atomic trade is deliberate — a concurrent
    * double-build is harmless (the loser unpersists its copy and
    * adopts the winner, so no cache leaks past [[clearCaches]]),
    * while a same-bin nesting is fatal. MemoDisciplineSpec pins the
    * `computeIfAbsent` ban source-wide and proves both halves on a
    * forced same-hash key collision. */
  private[graft] def memo(s: SparkSession, tag: String, dir: String)(
      build: => DataFrame): DataFrame =
    memoKeyed(cacheKey(s, tag, dir))(build)

  /** [[memo]] for callers that carry a pre-built key (registration
    * keys embedding a plan's identityHashCode, etc.). */
  private[graft] def memoKeyed(key: String)(build: => DataFrame): DataFrame = {
    val hit = liveCaches.get(key)
    if (hit != null) return hit
    val built = build
    val won = liveCaches.putIfAbsent(key, built)
    if (won == null) built
    else {
      // Free the loser's cache — but ONLY when its plan is distinct
      // from the winner's. The CacheManager registers by canonicalized
      // plan equality, so two racers running the SAME builder share
      // ONE cache entry (the second .persist() is a no-op against the
      // first's), and unpersisting the loser would silently
      // de-materialize the winner too — every later consumer then
      // re-pays the corpus pass the memo exists to amortize. A
      // plan-equal loser frame drops with nothing to free; clearCaches
      // reaches the shared entry through the winner.
      val distinctPlan = !built.queryExecution.analyzed
        .sameResult(won.queryExecution.analyzed)
      if (distinctPlan &&
          built.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
        built.unpersist()
      won
    }
  }

  /** HOUSE MEMO for build-once ARTIFACTS — [[memoKeyed]]'s
    * get → build → putIfAbsent discipline applied to the artifact
    * maps (parquet index dirs, catalog table names, the BPE merge
    * table, the events nanos probe). These maps had the exact
    * same-bin-nesting geometry as the round-16 liveCaches crash: a
    * builder that transitively reaches another `computeIfAbsent` on
    * its own ConcurrentHashMap throws `Recursive update` whenever the
    * two keys share a hash bin, and bin placement rides
    * `identityHashCode(session)` — per-JVM-run roulette. Until round
    * 18 the no-builder-reaches-its-own-map property was enforced only
    * by review (verdict r17 finding #1); routing every artifact memo
    * through this helper makes nesting structurally safe and lets
    * MemoDisciplineSpec ban `computeIfAbsent` source-wide.
    *
    * The non-atomic race trade is even cheaper here than for
    * [[memoKeyed]]'s DataFrames: every builder writes into a
    * [[graft.sources.FileRoundTrips.freshScratch]] directory or a
    * pid-scoped catalog name, so a concurrent double-build's loser is
    * an orphaned scratch artifact (reaped by the pid sweep / JVM-exit
    * hook) — nothing to unpersist, no shared-entry hazard. */
  private[graft] def dirMemo[V <: AnyRef](
      map: java.util.concurrent.ConcurrentHashMap[String, V], key: String)(
      build: => V): V = {
    val hit = map.get(key)
    if (hit != null) return hit
    val built = build
    val won = map.putIfAbsent(key, built)
    if (won == null) built else won
  }

  /** Round-16 A/B instrumentation for the cache-census pins: memo
    * tags listed in SPARK_GRAFT_NO_PERSIST (comma-separated) SKIP
    * their persist, turning that memoized relation into plain lineage
    * so each pinned payload cache's persist-vs-derive trade can be
    * measured without a code fork (interleaved Bench runs, numbers in
    * PLANS.md). Unset on every shipping path — results are identical
    * either way, only the pass count changes. */
  private val noPersistTags: Set[String] =
    sys.env.get("SPARK_GRAFT_NO_PERSIST")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)

  private[graft] def housePersist(tag: String, df: DataFrame): DataFrame =
    if (noPersistTags(tag)) df
    else df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** MinHash signature + banding, one codegen'd pass per document:
    * the [[graft.plans.LshBandSigs]] expression walks the 8-shingles
    * array-locally (16 ints of running state — no shingle explosion,
    * no md5-projection shuffle, no partial aggregation) and emits the
    * 4 band-signature md5s directly; posexplode unpacks them behind a
    * Generate boundary so the expression evaluates exactly once per
    * doc (CollapseProject re-inlines multi-referenced projections —
    * the reason the signatures and banding fuse into one expression).
    * Still bit-identical to the declarative salted-md5-chunk-minima
    * formulation, so the DuckDB oracle is unchanged (asserted
    * term-for-term in DedupSimilaritySpec). Docs are spread across
    * cores first: the pass is CPU-bound and a small corpus arrives as
    * one parquet split (at 100 TB the file count does this for
    * free). */
  private[operators] def lshBands(s: SparkSession, dir: String): DataFrame =
    memo(s, "lsh", dir)({
      GraftFunctions.register(s)
      Tables.spread(s, Tables.documents(s, dir), "doc_id")
        .select(col("doc_id"),
          posexplode(GraftFunctions.lsh_band_sigs(col("text"))).as(Seq("band", "sig")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })

  /** #41 MinHash+LSH candidate pairs: docs sharing ≥1 band bucket. */
  def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    val bands = lshBands(s, dir)
    val a = bands.alias("a")
    val b = bands.alias("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Trigram sets for the LSH-candidate docs only. The exact-verify
    * tier only ever touches candidate docs, so the O(len)-per-doc
    * trigram sets are built for pair participants only (semi-join
    * first) — at 100 TB that's the difference between a corpus-wide
    * array build and one proportional to the LSH candidate volume.
    * Persisted because each scorer's pair join consumes tri twice
    * (doc_a side, doc_b side) and [[jaccard]]/[[containment]] share
    * it; spread first because the build is CPU-bound and must not
    * inherit a single-split layout. */
  private def candidateTrigrams(s: SparkSession, dir: String, pairs: DataFrame): DataFrame =
    memo(s, "tri", dir)({
      val pairDocs = pairs.select(col("doc_a").as("doc_id"))
        .unionByName(pairs.select(col("doc_b").as("doc_id")))
        .distinct()
      housePersist("tri",
        Tables.spread(s, Tables.documents(s, dir), "doc_id")
          .join(pairDocs, Seq("doc_id"), "left_semi")
          .select(col("doc_id"), trigramSet(col("text")).as("tri")))
    })

  /** Pair relation with both sides' trigram sets joined on. */
  private def pairsWithTrigrams(s: SparkSession, dir: String): DataFrame = {
    val pairs = minhashLsh(s, dir)
    val tri = candidateTrigrams(s, dir, pairs)
    pairs
      .join(tri.select(col("doc_id").as("doc_a"), col("tri").as("tri_a")), "doc_a")
      .join(tri.select(col("doc_id").as("doc_b"), col("tri").as("tri_b")), "doc_b")
  }

  /** #43 Exact n-gram Jaccard, verified on the LSH candidates only
    * (the scale-correct two-phase pipeline: LSH filter → exact verify). */
  def jaccard(s: SparkSession, dir: String): DataFrame =
    pairsWithTrigrams(s, dir)
      .select(col("doc_a"), col("doc_b"),
        round(
          size(array_intersect(col("tri_a"), col("tri_b"))).cast("double") /
          (size(col("tri_a")) + size(col("tri_b")) -
            size(array_intersect(col("tri_a"), col("tri_b")))).cast("double"),
          4).as("jaccard"))

  /** #43b Broder containment score on the same LSH candidates:
    * catches SUBSET near-dups (one doc embedded in a longer one) that
    * symmetric Jaccard under-scores — |A∩B|/|A∪B| shrinks as the
    * size ratio grows, while |A∩B|/min(|A|,|B|) stays 1 for a true
    * subset. Identical candidate volume and (shared, persisted)
    * trigram relation as [[jaccard]]; only the scoring formula
    * differs, so the scale story is inherited. */
  def containment(s: SparkSession, dir: String): DataFrame =
    pairsWithTrigrams(s, dir)
      .select(col("doc_a"), col("doc_b"),
        round(
          size(array_intersect(col("tri_a"), col("tri_b"))).cast("double") /
          least(size(col("tri_a")), size(col("tri_b"))).cast("double"),
          4).as("containment"))

  /** Set-similarity threshold for [[setSimJoin]]: Jaccard ≥
    * [[SetSimNum]]/[[SetSimDen]] = 4/5, stated everywhere as integer
    * predicates (verify: (D+N)·I ≥ N·(|A|+|B|), from D·I ≥ N·U) so no
    * boundary ever sits on an FP seam. The threshold is the filter's
    * POWER dial: at t the prefix keeps n−⌈t·n⌉+1 ≈ (1−t)·n shingles,
    * so t = 1/2 exploded half of every doc into the join (measured
    * 118.9 s at sf0.1 — candidates ≈ all pairs sharing any
    * median-rarity shingle) while the near-dup-realistic 4/5 keeps
    * ~20% and candidates track true pairs. */
  val SetSimNum = 4
  val SetSimDen = 5

  /** #41e EXACT set-similarity join with PREFIX FILTERING (AllPairs —
    * Bayardo, Ma & Srikant, WWW'07; the deterministic complement of
    * the probabilistic MinHash-LSH tier): all document pairs with
    * WORD-TRIGRAM-set Jaccard ≥ [[SetSimNum]]/[[SetSimDen]],
    * guaranteed COMPLETE — no LSH false-negative band luck involved.
    * Tokens-not-chars is the PPJoin-literature setting and the cost
    * dial: ~150 word trigrams per doc vs ~1000 char 8-shingles keeps
    * the shingle relation (and its df agg, rank window and join
    * fan-in) 7× smaller for the same near-dup semantics (measured
    * 37.7 s → ~4 s at sf0.1/local[4] for identical candidates).
    *
    * The filter: order every doc's shingles by the GLOBAL (df, sh)
    * ascending order (rarest first) and explode only the first
    * n − ⌈t·n⌉ + 1 of them into the equi-join. The prefix theorem
    * says two sets with J ≥ t MUST share a prefix element under any
    * single global order — if all of A's prefix missed B, the ≥
    * ⌈t·n⌉ overlap would have to fit in A's suffix, which is too
    * short by construction. Rare-first ordering makes the surviving
    * join keys the LOW-df shingles, so candidate volume stays near
    * the true-pair count — the hot-shingle guard is structural: a
    * stop-shingle everyone shares sorts LAST and never enters a
    * prefix (of any doc with more than a couple of shingles).
    * Length compatibility (D·min ≥ N·max, from J ≥ N/D ⇒ min/max ≥
    * N/D) prunes inside the join condition before the dedup.
    *
    * Scale shape: ONE corpus tokenize builds the persisted per-doc
    * set arrays map-locally (no explode+regroup shuffle); df is a
    * shingle-partitioned count window and the rank a doc-keyed window
    * over the cache-derived exploded relation (both sorts spillable,
    * no join-backs); the join carries prefix rows only; the full sets
    * travel ONLY to verify surviving candidate pairs (array-local
    * `array_intersect`). Verification threshold,
    * output `inter`/`union` counts are exact integers; `jaccard` is
    * one division rounded 4. Proven complete against the naive n²
    * JVM join in DedupSimilaritySpec. */
  def setSimJoin(s: SparkSession, dir: String): DataFrame = {
    // word-trigram shingles; docs under 3 tokens carry no set and are
    // (identically in the oracle) absent from the join — the size>=3
    // guard also dodges the descending-sequence(1, n<1) trap.
    //
    // ONE tokenize total (round 15 — the cache-build-aware scan
    // census caught the old shape running FOUR: the prefix build
    // consumed the exploded shingle relation three times internally
    // and the sets build tokenized again). The sorted-distinct set
    // ARRAY builds map-locally (array_distinct + sort_array inside
    // the projection — no explode+regroup shuffle at all) and is the
    // one persisted relation, which the verify tail needs anyway;
    // the exploded relation derives FROM the cache, and df/cardinality
    // /rank are windows over it rather than join-backs.
    val sets = memo(s, "setsimsets", dir)(housePersist("setsimsets",
        Tables.documents(s, dir)
          .select(col("doc_id"), tokens(col("text")).as("t"))
          .filter(size(col("t")) >= 3)
          .select(col("doc_id"), sort_array(array_distinct(expr(
            """transform(sequence(1, size(t) - 2),
              |  i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1),
              |    element_at(t, i + 2)))""".stripMargin))).as("set"))))
    // No nested computeIfAbsent hazard: sets resolves BEFORE the
    // prefix builder enters the memoizer.
    val prefix = memo(s, "setsimpre", dir)({
      val sh = sets.select(col("doc_id"),
        size(col("set")).cast("int").as("n"), explode(col("set")).as("sh"))
      val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("sh"))
      sh.withColumn("df", count(lit(1)).over(Window.partitionBy(col("sh"))))
        .withColumn("rn", row_number().over(byDoc))
        // n − ceil(t·n) + 1 with ceil(N·n/D) = (N·n + D − 1) DIV D
        .filter(col("rn") <=
          expr(s"n - (($SetSimNum * n + ${SetSimDen - 1}) DIV $SetSimDen) + 1"))
        .select(col("doc_id"), col("sh"), col("n"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })
    val cands = prefix.select(col("doc_id").as("doc_a"), col("sh"), col("n").as("na"))
      .join(prefix.select(col("doc_id").as("doc_b"), col("sh"), col("n").as("nb")), "sh")
      .filter(col("doc_a") < col("doc_b") &&
        // J ≥ N/D ⇒ min/max ≥ N/D: D·min ≥ N·max both ways
        lit(SetSimDen) * col("na") >= lit(SetSimNum) * col("nb") &&
        lit(SetSimDen) * col("nb") >= lit(SetSimNum) * col("na"))
      .select(col("doc_a"), col("doc_b")).distinct()
    cands
      .join(sets.select(col("doc_id").as("doc_a"), col("set").as("set_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("set").as("set_b")), "doc_b")
      .withColumn("inter", size(array_intersect(col("set_a"), col("set_b"))))
      .withColumn("uni", size(col("set_a")) + size(col("set_b")) - col("inter"))
      .filter(lit(SetSimDen + SetSimNum) * col("inter") >=
        lit(SetSimNum) * (size(col("set_a")) + size(col("set_b"))))
      .select(col("doc_a"), col("doc_b"), col("inter"), col("uni").as("n_union"),
        round(col("inter").cast("double") / col("uni"), 4).as("jaccard"))
  }

  /** #41b Duplicate clustering: connected components over the LSH
    * collision graph via min-label propagation on the *bipartite
    * doc ↔ bucket graph* — docs sharing a (band, signature) bucket
    * are one component, so alternating "bucket label = min of member
    * labels" / "doc label = min of its buckets' labels" converges to
    * the same component minima as edge-based propagation WITHOUT ever
    * materializing the pairwise edge relation. That's the scale
    * property that matters: a hot bucket with m members contributes
    * m² candidate pairs but only m membership rows, so each round is
    * two keyed aggregations over a linear-size relation. Labels only
    * decrease; a scalar sum per round detects the fixpoint, reached
    * in O(component diameter) rounds (near-dup clusters are shallow).
    * The cluster id (= min doc_id in the component) is what a dedup
    * pipeline keys keeper-selection on. */
  def clusters(s: SparkSession, dir: String): DataFrame = {
    // Memoized through the house helper ([[memoKeyed]] — the body
    // itself builds nested memos: lshBands, memb). The memo matters
    // beyond a single query: [[Curation.dedupManifest]] consumes the
    // labels directly AND through keeperSelect — uncached, the whole
    // fixpoint loop ran TWICE per manifest invocation.
    val theLabels = memoKeyed(cacheKey(s, "clusterlabels", dir)) {
    // Memberships, restricted to buckets with ≥ 2 docs: exactly the
    // docs that appear in ≥ 1 candidate pair. bmin (min member) seeds
    // each doc with its first-hop neighborhood minimum for free.
    val bands = lshBands(s, dir)
    val memb = memo(s, "memb", dir)({
      val mb = bands
        .select(col("doc_id"), concat_ws("|", col("band"), col("sig")).as("bucket"))
      val multi = mb.groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("bmin"))
        .filter(col("n") >= 2)
        .select(col("bucket"), col("bmin"))
      mb.join(multi, "bucket")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })
    var labels = memb.groupBy(col("doc_id"))
      .agg(min(col("bmin")).as("cluster"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var prevSum = labels.agg(sum(col("cluster"))).collect().head.getLong(0)
    var converged = false
    var rounds = 0
    while (!converged && rounds < 30) {
      // bucket label = min member label; doc label = min bucket label.
      // The doc's own previous label is included via its memberships,
      // so labels are monotone non-increasing by construction.
      val bucketLabels = memb.join(labels, "doc_id")
        .groupBy(col("bucket")).agg(min(col("cluster")).as("bl"))
      val next0 = memb.join(bucketLabels, "bucket")
        .groupBy(col("doc_id")).agg(min(col("bl")).as("cluster"))
      // Every round persists through the CacheManager (so the
      // unpersist below actually frees blocks). Every 4th round the
      // *logical plan* is additionally cut to a LogicalRDD so a long
      // propagation chain can't accumulate a 30-join analysis plan;
      // recompute on loss walks the plain RDD lineage, which is
      // always reachable from the parquet scan.
      val cut = if (rounds % 4 == 3) s.createDataFrame(next0.rdd, next0.schema) else next0
      val next = cut.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nextSum = next.agg(sum(col("cluster"))).collect().head.getLong(0)
      labels.unpersist()
      labels = next
      converged = nextSum == prevSum
      prevSum = nextSum
      rounds += 1
    }
    // Round-count drift is a regression signal (each round is ~4
    // exchanges): surfaced on stderr so bench runs record it without
    // touching the driver-parsed stdout tail.
    System.err.println(s"graft.Dedup.clusters: fixpoint in $rounds rounds ($dir)")
    // The final labels stay persisted for every consumer (memo key
    // above); clearCaches() frees the blocks at pipeline end (a
    // racing loser's copy is unpersisted by memoKeyed itself).
    labels
    }
    theLabels.select(col("doc_id"), col("cluster"))
  }

  val SimhashBits = 60
  val SimhashChunks = 4
  val SimhashChunkBits: Int = SimhashBits / SimhashChunks

  /** #42 SimHash near-dup: 60-bit signatures from md5-derived token
    * hashes, computed in one pass by the codegen'd
    * [[graft.plans.SimHash60]] expression. Because the per-token hash
    * is the first 15 hex digits of md5, the signature is bit-identical
    * to the DuckDB bit-vote formulation, so the native fast path is
    * still oracle-checked. Pigeonhole banding on 4×15-bit chunks
    * guarantees recall for hamming ≤ 3 with one equality-join shuffle
    * (no pairwise scan). */
  def simhash(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    // Persisted like lshBands: the self-join consumes the chunk
    // relation twice, and correctness-by-reuse must not depend on
    // ReusedExchange surviving AQE's broadcast conversion — uncached,
    // the signature pass (tokenize + simhash60 over every doc) would
    // run on both sides.
    val chunks = memo(s, "simchunks", dir)({
      val sigs = Tables.spread(s, Tables.documents(s, dir), "doc_id")
        .select(col("doc_id"), GraftFunctions.simhash60(tokens(col("text"))).as("sig"))
      sigs.select(col("doc_id"), col("sig"),
        explode(array((0 until SimhashChunks).map { c =>
          struct(lit(c).as("chunk_id"),
            shiftrightunsigned(col("sig"), c * SimhashChunkBits)
              .bitwiseAND(lit((1L << SimhashChunkBits) - 1)).as("chunk"))
        }: _*)).as("cs"))
        .select(col("doc_id"), col("sig"), col("cs.chunk_id").as("chunk_id"), col("cs.chunk").as("chunk"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })
    val a = chunks.alias("a")
    val b = chunks.alias("b")
    a.join(b,
        col("a.chunk_id") === col("b.chunk_id") && col("a.chunk") === col("b.chunk") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
  }

  val EmbBands = 8

  /** SRP planes per band — the band space is EmbBands × 2^EmbPlanes
    * buckets, and with it FIXED the candidate self-join is QUADRATIC
    * in corpus size: bucket occupancy grows ∝ n, per-bucket pairs
    * ∝ n². Measured (round 19, SrpOccupancyProbe + BENCH_scale_r19
    * extension): at the 8×64 default, 10× vectors → 100.8× candidate
    * pairs (692 k → 69.8 M; max occupancy 176 → 1730; all 512
    * buckets saturated) and 48× wall-clock — the one superlinear
    * query on the measured surface. Contrast minhash_lsh, whose band
    * signatures are md5 strings (an effectively unbounded bucket
    * space): it measured 4.4× for the same 10×.
    *
    * Round 20 makes the DEFAULT scale-safe (r19 verdict #1): the
    * plane count is now DERIVED from the corpus —
    * w = max([[EmbPlanesMin]], ⌈log₂(n / [[EmbPlanesTargetOcc]])⌉) —
    * which holds mean bucket occupancy (and with it candidate volume
    * per vector) constant as n grows, instead of leaving the default
    * quadratic and hiding the fix behind an env var a deployment must
    * know to set. The constants are chosen so the derived value
    * reproduces the r19-validated operating points exactly: 6 at
    * every declared SF (n = 500/500/2000; stays 6 up to n = 3072, so
    * declared outputs are bit-identical to the r18 surface), 9 at the
    * sf1 probe (n = 20 000 — measured 3.9 s, under the linear line)
    * and 11 at the sf3 probe (n = 60 000). The n that feeds the
    * formula is one parquet count of the embeddings table — footer
    * metadata at scale, memoized per (session, sf dir) in
    * [[embPlanesCounts]] (build-once artifact class, survives
    * [[clearCaches]] like ivfIndexDirs: the count is a property of
    * the data, not of any cached plan). The generated DuckDB oracle
    * reads the SAME derived value (SparkEntry.oracleSql resolves it
    * through [[embPlanes]] for the dir being verified), so Spark and
    * oracle move in lockstep at any n.
    *
    * SPARK_GRAFT_EMB_PLANES still overrides the derivation outright
    * (deployment recall control — the recall given up per extra plane
    * is the standard 1-(1-p^w)^b LSH trade), now validated at read
    * (r19 advice): a malformed value previously surfaced as an opaque
    * ExceptionInInitializerError far from the env var. */
  val EmbPlanesMin = 6
  /** Target mean band-bucket occupancy for the derived plane count —
    * 48 reproduces the r19-validated (n, w) points: (≤3072, 6),
    * (20 000, 9), (60 000, 11). */
  val EmbPlanesTargetOcc = 48.0

  private[graft] def parseEmbPlanes(raw: String): Int = {
    val p =
      try raw.trim.toInt
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"SPARK_GRAFT_EMB_PLANES='$raw' is not an integer") }
    require(p >= 1 && p <= 30, s"SPARK_GRAFT_EMB_PLANES=$p out of range [1,30]")
    p
  }

  val EmbPlanesOverride: Option[Int] =
    sys.env.get("SPARK_GRAFT_EMB_PLANES").map(parseEmbPlanes)

  /** Pure derivation: planes for an n-vector corpus (override wins). */
  def embPlanesFor(n: Long): Int = EmbPlanesOverride.getOrElse {
    val derived = math.ceil(
      math.log(n.toDouble / EmbPlanesTargetOcc) / math.log(2.0)).toInt
    math.max(EmbPlanesMin, derived)
  }

  /** Build-once corpus-count memo backing [[embPlanes]] and [[semK]]
    * — same artifact-map class as ivfIndexDirs (created only via
    * [[dirMemo]], pinned in MemoDisciplineSpec, survives
    * [[clearCaches]] by design: a row count is a property of the sf
    * dir's data, and re-counting per bench rep would time the memo,
    * not the operator). */
  private val embPlanesCounts =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Embedding-corpus row count for `dir` (one metadata-cheap parquet
    * count on first use per session × dir). */
  private[graft] def embCount(s: SparkSession, dir: String): Long =
    dirMemo(embPlanesCounts, cacheKey(s, "embplanes", dir)) {
      java.lang.Long.valueOf(Tables.embeddings(s, dir).count())
    }.longValue()

  /** Corpus-derived SRP plane count for `dir`. */
  def embPlanes(s: SparkSession, dir: String): Int =
    embPlanesFor(embCount(s, dir))

  /** SemDeDup cluster count, corpus-derived (round 20, r19 verdict
    * #2): k = max([[graft.operators.Similarity.NumCentroids]],
    * round(√(n/10))) — the same default-scale-safe treatment as
    * [[embPlanes]], pinned to the historical 16 at every declared SF
    * (n = 500/500/2000; stays 16 up to n = 2722) so cluster ids —
    * declared output — are bit-identical, with the generated DuckDB
    * oracle reading the SAME derived value.
    *
    * Why √n and not the paper's k ∝ n: the within-cluster pair stage
    * costs n²/k but each Lloyd refinement costs n·k, so k ∝ n merely
    * moves the quadratic from the pair join into the assignment
    * passes (real SemDeDup deployments pair k ∝ n with APPROXIMATE
    * k-means; this operator's exact-DECIMAL Lloyd is the oracle
    * contract). k ∝ √n balances the two at Θ(n^1.5) — the optimum
    * available inside the contract: max(n·k, n²/k) is minimized at
    * k = √n. Measured by SemOccupancyProbe (OPTIMIZATION_r20.md):
    * the fixed k=16 pair volume grows ~n² exactly as the SRP band
    * space did. */
  def semKFor(n: Long): Int =
    math.max(Similarity.NumCentroids,
      math.round(math.sqrt(n.toDouble / 10.0)).toInt)

  def semK(s: SparkSession, dir: String): Int = semKFor(embCount(s, dir))
  val EmbCosTau = 0.4

  /** #44b Bucketed embedding near-dup, end-to-end: the scale path for
    * [[embedding]]. Each vector gets [[EmbBands]] independent
    * sign-random-projection bucket signatures ([[embPlanes]] planes
    * each, OR-banded exactly like MinHash-LSH bands); candidates are
    * pairs sharing any (band, bucket); the exact cosine is verified
    * only inside buckets. Embeddings never ride the candidate
    * self-join — the banded relation is (vec_id, band, bucket) ≈
    * 20 bytes/row, and vectors are joined back once per side for the
    * verify, so the quadratic stage operates on the smallest possible
    * rows (the same filter→verify contract as [[minhashLsh]] →
    * [[jaccard]]).
    *
    * Tuning: recall for a pair at angle θ is 1-(1-p^w)^b with
    * p = 1-θ/π, w = planes/band, b = bands. 8×6 gives ~0.98 at
    * cos 0.9 (the regime near-dup LSH is built for) and ~0.46 at the
    * corpus's 0.45-cosine tail; candidate volume falls n²→n²·2^-w per
    * band. w grows ~log₂(n) via [[embPlanes]] so per-bucket occupancy
    * stays bounded at any scale (w=6 at every declared SF). Recall on
    * planted near-identical vectors is spec-asserted ≥0.9
    * (DedupSimilaritySpec). */
  def embeddingLsh(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir)
    val planes = embPlanes(s, dir)
    // Persisted like lshBands: the self-join consumes the banded
    // relation twice, and without the cache the 48 plane projections
    // per vector run on both sides.
    // All 8 band signatures in one srp_band_sigs kernel pass per
    // vector (posexplode position = band id); the earlier 48-way
    // dot_d fan-out walked and re-cast the vector once per plane and
    // dominated this query's bench time.
    val banded = memo(s, "embbands", dir)(Tables.spread(s, e, "vec_id")
        .select(col("vec_id"),
          posexplode(GraftFunctions.srp_band_sigs(col("embedding"), EmbBands, planes))
            .as(Seq("band", "bucket")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val a = banded.alias("a")
    val b = banded.alias("b")
    val cands = a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    val emb = e.select(col("vec_id"), col("embedding"))
    cands
      .join(emb.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a")), "vec_a")
      .join(emb.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b")), "vec_b")
      .withColumn("cos", round(GraftFunctions.cosine_sim(col("emb_a"), col("emb_b")), 4))
      .filter(col("cos") >= EmbCosTau)
      .select(col("vec_a"), col("vec_b"), col("cos"))
  }

  /** #44c Cross-modal semantic verify: MinHash-LSH *text* candidates
    * re-scored by *embedding* cosine — the pipeline a curation stack
    * actually runs (cheap surface-form filter, semantic verify).
    * Inner join on the embedding table: docs without an embedding
    * (at 100 TB not everything is embedded) simply fall out of the
    * verify tier. Candidate volume is the LSH output, so the cosine
    * runs on O(candidates), never O(n²); embeddings join back once
    * per side exactly like [[jaccard]]'s trigram sets. */
  def semantic(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val pairs = minhashLsh(s, dir)
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    pairs
      .join(emb.select(col("vec_id").as("doc_a"), col("embedding").as("emb_a")), "doc_a")
      .join(emb.select(col("vec_id").as("doc_b"), col("embedding").as("emb_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(GraftFunctions.cosine_sim(col("emb_a"), col("emb_b")), 4).as("cos_sim"))
  }

  val SemTau = 0.4

  /** #44d SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space with k-means,
    * then look for near-identical pairs ONLY within clusters — the
    * quadratic stage is bounded by cluster occupancy (n²/k per
    * cluster in expectation), the property that makes semantic dedup
    * run at corpus scale where all-pairs cannot. Within a cluster, a
    * doc is REMOVED when it has a ≥ [[SemTau]]-cosine neighbor whose
    * keep priority is higher; following the paper, the member with
    * the LOWEST cosine to its centroid survives (keeps the most
    * atypical representative, dropping redundant typical points),
    * ties broken by lowest vec_id.
    *
    * Reuses the ann_ivf index machinery ([[Similarity.lloydCentroids]]
    * — exact-DECIMAL Lloyd means, map-only argmax assignment), so the
    * DuckDB oracle reproduces clusters, centroid similarities, and
    * keep priorities bit-for-bit. Output: one row per vector with its
    * cluster, centroid similarity, and the removal verdict.
    *
    * Recall contract (measured vs the exact all-pairs tier
    * [[embedding]], spec-asserted): EVERY co-clustered ≥τ pair
    * produces a removal (within-cluster recall = 1.0 — 17/17 at
    * sf0.001, 18/18 at sf0.01); pairs split across clusters are the
    * method's documented blind spot (~30% co-cluster at k=16 for
    * this corpus's moderate-τ=0.4 tail — the paper's regime is
    * cos ≥ 0.9 near-identicals, which co-cluster almost surely; at
    * lower τ, raise k more slowly or multi-probe the assignment). */
  def semDedup(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val eD = Similarity.embD(s, dir)
    // k is corpus-derived (round 20, [[semK]]): 16 at every declared
    // SF — identical plan and output — growing ∝ √n past n = 2722 so
    // the within-cluster pair stage stays Θ(n^1.5) instead of n²/16.
    val k = semK(s, dir)
    val cents = Similarity.lloydCentroids(eD, k)
    // Persisted: consumed three times (both self-join sides + the
    // report join-back); uncached, each consumer re-runs the k·n
    // cosine argmax over the whole corpus.
    val assigned = memo(s, "semassign", dir)(housePersist("semassign", {
      if (k <= Similarity.BroadcastAssignK) {
        val best = array_max(Similarity.scored(cents))
        eD.select(col("vec_id"), col("embedding"),
          best.getField("c_id").as("cluster"), best.getField("cos_c").as("cent_sim"))
      } else
        // Past the plan-literal ceiling the broadcast-relation
        // arg-max takes over, exactly like annIvf's k switch; withSim
        // carries the assigned cluster's cosine for the keep
        // priority.
        Similarity.assignBroadcast(s, eD, cents,
            carry = Seq("embedding"), withSim = true)
          .select(col("vec_id"), col("embedding"), col("cluster"), col("cent_sim"))
    }))
    val a = assigned.alias("a")
    val b = assigned.alias("b")
    // Keep-priority comparison on the UNROUNDED centroid cosine (both
    // engines compute it term-for-term identically); the self-join is
    // cluster-keyed, so candidate volume is per-cluster quadratic,
    // never global.
    val removed = a.join(b,
        col("a.cluster") === col("b.cluster") &&
        col("a.vec_id") =!= col("b.vec_id") &&
        GraftFunctions.cosine_sim(col("a.embedding"), col("b.embedding")) >= SemTau &&
        (col("b.cent_sim") < col("a.cent_sim") ||
          (col("b.cent_sim") === col("a.cent_sim") && col("b.vec_id") < col("a.vec_id"))))
      .select(col("a.vec_id").as("vec_id")).distinct()
      .withColumn("removed", lit(true))
    assigned
      .join(removed, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        round(col("cent_sim"), 4).as("cent_sim"),
        coalesce(col("removed"), lit(false)).as("is_removed"))
  }

  /** #44 Embedding cosine near-dup (exact verify tier; the bucketed
    * scale path is [[embeddingLsh]]). Uses the codegen'd
    * CosineSimilarity Catalyst expression. */
  def embedding(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val e = Tables.embeddings(s, dir)
    val a = Tables.spread(s, e, "vec_id")
      .select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
    val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos", round(GraftFunctions.cosine_sim(col("emb_a"), col("emb_b")), 4))
      .filter(col("cos") >= 0.4)
      .select(col("vec_a"), col("vec_b"), col("cos"))
  }
}
