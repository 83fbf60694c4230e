package graft

import graft.operators.{Eval, Learn}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Eval family: confusion metrics and rank AUC, both checked against
  * naive driver-side recomputations from first principles (the
  * O(pos·neg) pair count for AUC — exactly the thing the operator's
  * rank identity avoids materializing). */
class EvalSpec extends SparkSpecBase {

  test("eval_confusion: counts reconcile and metrics are the exact ratios") {
    val preds = Learn.nbClassify(spark, sfDir)
      .select(col("doc_id"), col("lang_pred"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val truth = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds.keySet == truth.keySet, "every doc classified exactly once")

    val rows = Eval.evalConfusion(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    // Row set = classes appearing in truth (spine), no dupes.
    assert(rows.keySet == truth.values.toSet)
    // Global reconciliation: Σ n_true = corpus, Σ n_correct = accuracy hits.
    assert(rows.values.map(_.getLong(1)).sum == truth.size)
    assert(rows.values.map(_.getLong(3)).sum ==
      truth.count { case (d, l) => preds(d) == l })
    rows.foreach { case (c, r) =>
      val nTrue = truth.values.count(_ == c)
      val nPred = preds.values.count(_ == c)
      val tp = truth.count { case (d, l) => l == c && preds(d) == c }
      assert(r.getLong(1) == nTrue && r.getLong(2) == nPred && r.getLong(3) == tp)
      if (nPred == 0) assert(r.isNullAt(4))
      else assert(r.getDouble(4) ==
        BigDecimal(tp.toDouble / nPred).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(r.getDouble(5) ==
        BigDecimal(tp.toDouble / nTrue).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      // F1 via the collapsed 2tp/(n_true+n_pred) identity == 2pr/(p+r)
      // on the unrounded ratios.
      val f1 = 2.0 * tp / (nTrue + nPred)
      assert(r.getDouble(6) ==
        BigDecimal(f1).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("eval_rank: metrics equal a naive replay over the verified BM25 ranking") {
    import graft.operators.Search
    val relevant = Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("t"))
      .collect()
      .filter(_.getSeq[String](1).distinct.count(Search.QueryTerms.contains) >= Search.RelMinTerms)
      .map(_.getLong(0)).toSet
    val ranking = Search.searchBm25(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    val hitRanks = ranking.filter(p => relevant(p._1)).values.toSeq
    def disc(i: Int) = BigDecimal(1.0 / (math.log(i + 1.0) / math.log(2.0)))
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val dcg = hitRanks.map(disc).sum
    val idcg = (1 to math.min(Search.TopK, relevant.size)).map(disc).sum
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

    val row = Search.evalRank(spark, sfDir).collect()
    assert(row.length == 1)
    val r = row(0)
    assert(r.getInt(0) == Search.TopK)
    assert(r.getLong(1) == hitRanks.size.toLong && r.getLong(2) == relevant.size.toLong)
    assert(r.getDouble(3) == r4(hitRanks.size.toDouble / Search.TopK))
    assert(r.getDouble(4) == r4(hitRanks.size.toDouble / relevant.size))
    assert(r.getDouble(5) == r4((dcg / idcg).toDouble))
    assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    assert(relevant.nonEmpty && hitRanks.nonEmpty, "metrics must have signal at this SF")
  }

  test("eval_auc: rank identity equals the naive O(pos·neg) pair count") {
    val en = TextFunctions.langMarkers.toMap.apply("en")
    val scored = Tables.documents(spark, sfDir).select(
      TextFunctions.langScore(col("text"), en).cast("long").as("score"),
      (col("lang") === "en").as("is_pos"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val pos = scored.filter(_._2).map(_._1)
    val neg = scored.filterNot(_._2).map(_._1)
    // Naive: count concordant pairs + half-credit ties over all
    // pos×neg pairs (in doubled-integer space, so it's exact).
    val u2 = pos.iterator.map { p =>
      2L * neg.count(_ < p) + neg.count(_ == p)
    }.sum
    val expAuc = BigDecimal(u2.toDouble / (2.0 * pos.length * neg.length))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

    val r = Eval.evalAuc(spark, sfDir).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == pos.length && r(0).getLong(1) == neg.length)
    assert(r(0).getDouble(2) == expAuc)
    assert(r(0).getDouble(3) ==
      BigDecimal(u2.toDouble / (pos.length.toDouble * neg.length) - 1.0)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // Sanity bounds only — the synthetic corpus draws text
    // independently of the lang label, so the heuristic's AUC hovers
    // near 0.5 (measured 0.4372 at sf0.001); the operator's contract
    // is the exact rank identity above, not the detector's power.
    assert(r(0).getDouble(2) >= 0.0 && r(0).getDouble(2) <= 1.0)
    assert(r(0).getLong(0) > 0 && r(0).getLong(1) > 0)
  }
}
