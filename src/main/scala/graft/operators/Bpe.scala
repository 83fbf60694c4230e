package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import graft.plans.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer TRAINING (SURVEY §2.4 #50b/c) — the
  * on-cluster answer to "no public vocab file ships in this
  * container": production pipelines train their own merges on their
  * own corpus (Sennrich et al. 2016, arXiv:1508.07909), and the
  * training loop is corpus-scale aggregation — exactly this engine's
  * job. Reference semantics: the `lib/aggregate` iterative-job
  * pattern (each round is one ValueAggregator-style keyed count; the
  * driver holds only the k-row merge table between rounds — the same
  * scalar-state contract as the Lloyd/fixpoint loops).
  *
  * Scale shape: the per-round pair count runs over the DISTINCT-token
  * vocabulary weighted by corpus frequency, not the corpus — the one
  * corpus-sized pass is the initial token-frequency aggregation
  * (partial+final, 40-byte-ish rows). Each round: segment the vocab
  * under the current merges (codegen'd [[graft.plans.BpeSegment]]
  * kernel, merge table shipped as a plan constant), explode adjacent
  * symbol pairs, one weighted count, take the arg-max — a total order
  * (weight DESC, left ASC, right ASC) so training is deterministic
  * and reproducible cross-run. [[NumMerges]] rounds ⇒ O(k) tiny jobs
  * after the one corpus pass.
  *
  * No DuckDB oracle by declared design (iterative re-segmentation is
  * not one-shot SQL — same 🔶 contract as the GK quantile sketch);
  * BpeSpec carries correctness: the trainer must equal a naive
  * driver-side reference exactly on planted corpora, and the kernel
  * has a randomized property test against a naive apply.
  */
object Bpe {

  val NumMerges = 12

  /** (token, freq) corpus vocabulary — the one corpus-sized pass,
    * persisted (house cache rule: every training round consumes it). */
  private def vocab(s: SparkSession, dir: String): DataFrame =
    Dedup.liveCaches.computeIfAbsent(Dedup.cacheKey(s, "bpevocab", dir), _ =>
      Tables.documents(s, dir)
        .select(explode(tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("freq"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Train up to `k` merges over a (token, freq) relation. Stops
    * early when no adjacent pair occurs with weight ≥ 2 (nothing left
    * to compress). Returns rank-ordered (left, right, weight). */
  private[graft] def trainOn(v: DataFrame, k: Int): Seq[(String, String, Long)] = {
    var merges = Vector.empty[(String, String, Long)]
    var done = false
    while (merges.length < k && !done) {
      val flat = merges.flatMap(m => Seq(m._1, m._2))
      val seg = GraftFunctions.bpe_segment(col("token"), flat)
      // Adjacent-pair explosion is guarded on size ≥ 2: Spark's
      // sequence(1, 0) would DESCEND (step −1), not return empty.
      val top = v
        .select(col("freq"), seg.as("sym"))
        .filter(size(col("sym")) >= 2)
        .select(col("freq"), explode(transform(
          sequence(lit(1), size(col("sym")) - 1),
          i => struct(element_at(col("sym"), i).as("l"),
            element_at(col("sym"), i + lit(1)).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("w"))
        .orderBy(col("w").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty || top.head.getLong(2) < 2) done = true
      else merges = merges :+ ((top.head.getString(0), top.head.getString(1),
        top.head.getLong(2)))
    }
    merges
  }

  /** Trained merge tables by (session, sf) — the build-once artifact
    * [[tokensBpe]] serves from (the ivfIndexDir contract; at 100 TB
    * the merge table is a tiny published file every encode job
    * ships). [[bpeTrain]] always retrains — it IS the build path and
    * must measure it — then refreshes this cache for the serve side. */
  private val mergeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, String, Long)]]()

  /** #50b driver surface: the learned merge table as data —
    * deterministic, so `rank` is reproducible run-to-run. */
  def bpeTrain(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val m = trainOn(vocab(s, dir), NumMerges)
    mergeCache.put(Dedup.cacheKey(s, "bpemerges", dir), m)
    import s.implicits._
    m.zipWithIndex.map { case ((l, r, w), i) => (i + 1, l, r, w) }
      .toDF("rank", "left", "right", "weight")
  }

  private def trainedMerges(s: SparkSession, dir: String): Seq[(String, String, Long)] =
    mergeCache.computeIfAbsent(Dedup.cacheKey(s, "bpemerges", dir), _ => {
      GraftFunctions.register(s)
      trainOn(vocab(s, dir), NumMerges)
    })

  /** #50c BPE-denominated token counts per doc under the learned
    * merges — what makes `mix_plan`/`pack_sequences`-style budgets
    * tokenizer-accurate instead of whitespace-approximate. One
    * codegen pass per doc; the merge table rides the plan as a
    * constant (no join, no shuffle). */
  def tokensBpe(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val flat = trainedMerges(s, dir).flatMap(m => Seq(m._1, m._2))
    Tables.spread(s, Tables.documents(s, dir), "doc_id")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        size(col("toks")).as("n_tokens_ws"),
        aggregate(
          transform(col("toks"),
            t => size(GraftFunctions.bpe_segment(t, flat))),
          lit(0), (acc, x) => acc + x).as("n_symbols_bpe"))
  }
}
