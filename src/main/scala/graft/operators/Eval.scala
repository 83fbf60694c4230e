package graft.operators

import graft.Tables
import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation operators — the metrics tier every trained face
  * (nb_classify, knn_classify, the langid heuristic) feeds in a real
  * pipeline, and the reference-era analogue of the evaluation job a
  * Mahout/Hadoop training chain appended after the scoring pass
  * (reference semantics: one reducer pass over (truth, prediction)
  * pairs emitting per-class counts; e.g. the confusion-matrix
  * reducers shipped around Hadoop 2.x ML pipelines).
  *
  * Both faces follow the house exactness discipline: every metric is
  * a single division of EXACT integer counts, rounded at 4 — there
  * is no FP accumulation anywhere, so both queries hash-check
  * cross-engine with no tolerance story at all.
  */
object Eval {

  /** #70 Per-class confusion report for the NB language classifier
    * ([[Learn.nbClassify]]) against the corpus's own labels:
    * n_true/n_pred/n_correct per class plus precision, recall, F1.
    *
    * Identities keep everything integer-exact: precision = tp/n_pred,
    * recall = tp/n_true, and F1 = 2·p·r/(p+r) collapses to
    * 2·tp/(n_true+n_pred) — one division of exact longs, no
    * intermediate doubles. Classes with zero predictions emit NULL
    * precision (0/0), mirrored by the oracle's CASE.
    *
    * Scale shape: predictions are corpus-sized but everything after
    * the one doc_id equi-join (truth ⋈ prediction) aggregates to the
    * LABEL-bounded class list — conditional sums with map-side
    * partials, one exchange keyed by class. The class spine is the
    * distinct-lang relation (label-bounded, broadcast), left-joined
    * so a class the model never predicts still reports. */
  def evalConfusion(s: SparkSession, dir: String): DataFrame = {
    // ONE classify pass (round 14): the per-direction aggregations
    // both derive from the |langs|²-bounded confusion-CELL matrix —
    // before, byTrue and byPred were separate consumers of the
    // truth⋈preds join and each re-ran the whole NB classify chain
    // (exchange reuse does not deduplicate the branches). The cell
    // relation persists via the house memo so the two marginal
    // aggregations read |langs|² rows, not the corpus.
    val cells = graft.operators.Dedup.memo(s, "confcells", dir)({
        val truth = Tables.documents(s, dir).select(col("doc_id"), col("lang"))
        val preds = Learn.nbClassify(s, dir).select(col("doc_id"), col("lang_pred"))
        truth.join(preds, Seq("doc_id"))
          .groupBy(col("lang"), col("lang_pred")).agg(count(lit(1)).as("n"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      })
    val byTrue = cells.groupBy(col("lang")).agg(
      sum(col("n")).as("n_true"),
      sum(when(col("lang") === col("lang_pred"), col("n")).otherwise(0L)).as("n_correct"))
    val byPred = cells.groupBy(col("lang_pred").as("lang"))
      .agg(sum(col("n")).as("n_pred"))
    byTrue.join(byPred, Seq("lang"), "left")
      .select(col("lang"), col("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"), col("n_correct"),
        when(coalesce(col("n_pred"), lit(0L)) === 0, lit(null).cast("double"))
          .otherwise(round(col("n_correct").cast("double") / col("n_pred"), 4))
          .as("precision"),
        round(col("n_correct").cast("double") / col("n_true"), 4).as("recall"),
        round(lit(2.0) * col("n_correct") / (col("n_true") + coalesce(col("n_pred"), lit(0L))), 4)
          .as("f1"))
  }

  /** #70b ROC AUC of the heuristic language-ID score
    * ([[TextFunctions.langScore]] for English) as a detector of
    * lang = 'en' — the threshold-free discrimination metric an
    * evaluation pass reports next to the confusion matrix. Computed
    * by the Mann–Whitney rank identity WITHOUT materializing the
    * O(pos·neg) pair space:
    *
    *   2U = Σ_scores  n_pos(s) · (2·cum_neg_below(s) + n_neg(s)),
    *   AUC = 2U / (2 · n_pos · n_neg)
    *
    * — the n_neg(s)/2 tie credit doubled into exact-integer space,
    * so 2U is an exact long and AUC is ONE division, rounded 4.
    * The score is the integer marker-occurrence count, so grouping
    * keys are exact.
    *
    * Scale shape: one corpus-sized conditional-count aggregation to
    * the per-score relation (SCORE-CARDINALITY-bounded — marker
    * counts, a few dozen distinct values), then the running-sum
    * window and final sum run on that bounded relation; the
    * unpartitioned window is deliberate and safe for the same reason
    * the quantile report's is: its input can never exceed the score
    * cardinality regardless of corpus size. Output also carries the
    * Gini coefficient (2·AUC − 1). */
  def evalAuc(s: SparkSession, dir: String): DataFrame = {
    val en = TextFunctions.langMarkers.toMap.apply("en")
    val scored = Tables.documents(s, dir).select(
      TextFunctions.langScore(col("text"), en).cast("long").as("score"),
      (col("lang") === "en").as("is_pos"))
    val perScore = scored.groupBy(col("score")).agg(
      sum(when(col("is_pos"), 1L).otherwise(0L)).as("np"),
      sum(when(col("is_pos"), 0L).otherwise(1L)).as("nn"))
    val w = Window.orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perScore
      .withColumn("cum_nn_below", sum(col("nn")).over(w) - col("nn"))
    cum.agg(
      sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
      sum(col("np") * (lit(2) * col("cum_nn_below") + col("nn"))).as("u2"))
      .select(col("n_pos"), col("n_neg"),
        // AUC is undefined without both classes present: NULL (the
        // eval_confusion NULL-precision pattern) instead of a 0/0
        // NaN with engine-dependent rendering.
        when(col("n_pos") === 0 || col("n_neg") === 0, lit(null).cast("double"))
          .otherwise(round(
            col("u2").cast("double") / (lit(2.0) * col("n_pos") * col("n_neg")), 4))
          .as("auc"),
        when(col("n_pos") === 0 || col("n_neg") === 0, lit(null).cast("double"))
          .otherwise(round(
            col("u2").cast("double") / (col("n_pos") * col("n_neg")) - lit(1.0), 4))
          .as("gini"))
  }
}
