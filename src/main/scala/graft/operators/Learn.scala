package graft.operators

import graft.Tables
import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Learned-model operators — the classic MapReduce ML workloads
  * (reference analogue: the Mahout-era count-based trainers that ran
  * as aggregation job chains on Hadoop 2.x, and the blocked
  * matrix-multiply examples from the MapReduce literature).
  *
  * Naive Bayes here is the LEARNED counterpart of the heuristic
  * n-gram language ID ([[TextAnalysis.langid]]): train multinomial NB
  * with Laplace smoothing on the corpus's own (lang, token) counts,
  * then classify every document — two registered faces, both fully
  * oracle-checked because training is nothing but exact integer
  * count aggregation and the scoring chain follows the
  * [[TextAnalysis.lmScore]] determinism pattern (ln of exact
  * rationals, per-doc double sums, round-4 absorbing summation order
  * and last-ulp libm differences — the house irrational rule).
  */
object Learn {

  /** The (class × vocabulary) training grid shared by both faces:
    * one row per (lang, term) — including UNSEEN pairs, whose
    * smoothed log-likelihood ln(1/(n_tok_c+V)) the classifier needs —
    * with the class prior alongside. Grid size is |classes|·|vocab|:
    * bounded by the label space and vocabulary, NOT the corpus, so at
    * 100 TB it broadcasts while the only corpus-sized work is one
    * exploded-token count aggregation with map-side partials. */
  private def nbGrid(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), explode(tokens(col("text"))).as("term"))
    val classTok = toks.groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).as("n_tc"))
    val classTot = toks.groupBy(col("lang")).agg(count(lit(1)).as("n_tok"))
    val vocab = toks.select(col("term")).distinct()
    val vocabN = vocab.agg(count(lit(1)).as("v"))
    val classDocs = Tables.documents(s, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val nDocs = Tables.documents(s, dir).agg(count(lit(1)).as("n"))
    classDocs.crossJoin(broadcast(vocab))
      .join(classTok, Seq("lang", "term"), "left")
      .join(classTot, Seq("lang"))
      .crossJoin(broadcast(vocabN))
      .crossJoin(broadcast(nDocs))
      .select(col("lang"), col("term"),
        coalesce(col("n_tc"), lit(0L)).as("n_tc"),
        log((coalesce(col("n_tc"), lit(0L)) + lit(1.0)) /
          (col("n_tok") + col("v"))).as("loglik"),
        log(col("n_docs").cast("double") / col("n")).as("logprior"))
  }

  /** #69 Multinomial Naive Bayes TRAINING (Laplace add-1): the full
    * smoothed (lang, term) log-likelihood grid + class log-priors.
    * P(t|c) = (n_tc + 1) / (n_tok_c + V). Pure count arithmetic —
    * every input to every ln is an exact integer ratio, so the grid
    * hash-checks cross-engine at round-4. */
  def nbTrain(s: SparkSession, dir: String): DataFrame =
    nbGrid(s, dir)
      .select(col("lang"), col("term"), col("n_tc"),
        round(col("loglik"), 4).as("loglik"),
        round(col("logprior"), 4).as("logprior"))

  /** #69b Naive Bayes CLASSIFICATION: argmax_c [ log P(c) +
    * Σ_tokens log P(t|c) ] per document, token repeats counted
    * (multinomial). Plan shape at 100 TB: the grid is
    * |classes|·|vocab|-bounded and BROADCASTS; the corpus-sized work
    * is one exploded-token pass fanned out |classes|-fold, aggregated
    * per (doc, class) with map-side partials, then a per-doc window
    * argmax. Determinism: scores round at 4 BEFORE the argmax
    * ordering (rounded doubles are bit-equal cross-engine under the
    * irrational rule; ranking on raw doubles could flip a last-ulp
    * tie), lang ascending breaks exact ties. */
  def nbClassify(s: SparkSession, dir: String): DataFrame = {
    val grid = nbGrid(s, dir)
    val docToks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val scored = docToks
      .join(broadcast(grid), Seq("term"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(round(sum(col("loglik")) + max(col("logprior")), 4).as("score"))
    val byDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("lang").asc)
    scored.withColumn("rk", row_number().over(byDoc))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("lang").as("lang_pred"), col("score"))
  }

  /** #69c Gram matrix Eᵀ·E over the embedding corpus — the blocked
    * MATRIX MULTIPLY of the MapReduce literature (one of the original
    * canonical examples) in its outer-product formulation, and the
    * covariance/PCA precursor a real embedding pipeline computes.
    * Each row contributes its d·(d+1)/2 upper-triangle products
    * ARRAY-LOCALLY (one codegen'd nested transform, no self-join, no
    * per-dimension explode-then-join); only (i, j, partial-sum)
    * triples ride the exchange, so the shuffle is d²-bounded at any
    * corpus size — the same stripes-over-pairs argument as
    * cooccurrence. Accumulation in DECIMAL(28,12) (the PageRank
    * contribution rule) pins FP addition order cross-engine; the
    * float→double element casts are exact. */
  def matmulGram(s: SparkSession, dir: String): DataFrame = {
    val d = Similarity.EmbDim
    Tables.embeddings(s, dir)
      .select(expr(
        s"""explode(flatten(transform(sequence(1, $d), i ->
           |  transform(sequence(i, $d), j -> struct(i AS i, j AS j,
           |    CAST(CAST(element_at(embedding, i) AS DOUBLE)
           |      * CAST(element_at(embedding, j) AS DOUBLE)
           |      AS DECIMAL(28,12)) AS p)))))""".stripMargin).as("x"))
      .select(col("x.i"), col("x.j"), col("x.p"))
      .groupBy(col("i"), col("j"))
      .agg(round(sum(col("p")).cast("double"), 4).as("gram"))
  }

  /** Shared SQL fragment for the oracle grid (mirrors [[nbGrid]]). */
  private[graft] def nbGridSql(tokensSql: String): String =
    s"""toks AS MATERIALIZED (SELECT doc_id, lang, unnest($tokensSql) AS term FROM documents),
       |ct AS (SELECT lang, term, count(*) AS n_tc FROM toks GROUP BY 1, 2),
       |tot AS (SELECT lang, count(*) AS n_tok FROM toks GROUP BY 1),
       |voc AS (SELECT DISTINCT term FROM toks),
       |vn AS (SELECT count(*) AS v FROM voc),
       |cls AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
       |nn AS (SELECT count(*) AS n FROM documents),
       |grid AS (
       |  SELECT c.lang, t.term, coalesce(ct.n_tc, 0) AS n_tc,
       |    ln((coalesce(ct.n_tc, 0) + 1.0) / (tot.n_tok + vn.v)) AS loglik,
       |    ln(CAST(c.n_docs AS DOUBLE) / nn.n) AS logprior
       |  FROM cls c CROSS JOIN voc t
       |  LEFT JOIN ct ON ct.lang = c.lang AND ct.term = t.term
       |  JOIN tot ON tot.lang = c.lang, vn, nn)""".stripMargin
}
