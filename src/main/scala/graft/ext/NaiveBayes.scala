package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial naive Bayes text classification (add-one smoothing,
  * McCallum & Nigam AAAI-98 workshop formulation) — the LEARNED
  * counterpart of the dictionary language-ID heuristic
  * ([[TextAnalysis.languageId]]): instead of fixed profile word lists,
  * the class-conditional token likelihoods are ESTIMATED from a held-in
  * training split, and the held-out split is scored by
  * argmax_c [ ln P(c) + Σ_w ln P(w|c) ].
  *
  * Everything is relational — no model object leaves the cluster:
  *  - training is two hash aggregates (token-class counts, class
  *    totals) plus a distinct for the vocabulary;
  *  - the "model" is the DENSE (vocab × classes) likelihood table,
  *    vocabulary-bounded (never corpus-bounded) and built with a
  *    broadcast cross of the tiny class list, so unseen-in-class
  *    tokens get their smoothed floor relationally instead of through
  *    driver-side defaulting;
  *  - scoring is one join of held-out tokens to the likelihood table
  *    and one aggregate per (doc, class); argmax is a per-doc
  *    partitioned window with an explicit (score desc, class asc)
  *    tie-break.
  *
  * Out-of-vocabulary held-out tokens are dropped by the inner join (the
  * standard closed-vocabulary convention); a held-out doc with zero
  * in-vocabulary tokens drops out of the scored set — both conventions
  * are mirrored by the oracle.
  *
  * Determinism: per-(w,c) log-likelihoods are ln of exact
  * integer-ratio doubles — identical operands on both engines
  * (the text_lm_score family precedent); the per-(doc,class) sum is
  * pinned to 6dp BEFORE the prior is added and the argmax compares,
  * so engine-order float noise never reaches the ranking.
  */
object NaiveBayes {

  /** Train on `tokens` rows where `!isTest`, predict the rows where
    * `isTest`, and return the held-out confusion matrix
    * (label, pred, n) ordered by (label, pred).
    *
    * @param tokens occurrence-level (doc_id, label, w) rows
    * @param isTest boolean Column over the token rows (a pure function
    *               of doc_id, e.g. an md5 fold) selecting the held-out
    *               split
    */
  def confusion(tokens: DataFrame, isTest: Column): DataFrame = {
    // persisted: the tokenized split feeds four training aggregates
    // (doc priors, token-class counts, class totals, vocabulary) plus
    // the scoring join — one materialization instead of five scans
    val toks = graft.Caches.persist(
      tokens.select(col("doc_id"), col("label"), col("w"),
        isTest.as("is_test")))
    val train = toks.filter(!col("is_test"))
    val test = toks.filter(col("is_test"))

    // class priors from TRAIN DOC counts: ln(docs_c / docs_total)
    val trainDocs = train.select("doc_id", "label").distinct()
    val classDocs = trainDocs.groupBy("label").agg(count(lit(1)).as("dc"))
    val totalDocs = trainDocs.agg(count(lit(1)).as("dt"))
    val priors = classDocs.crossJoin(broadcast(totalDocs))
      .select(col("label").as("c"),
        round(log(col("dc").cast("double") / col("dt").cast("double")), 6)
          .as("prior"))

    // token-class counts, class token totals, vocabulary size
    val wc = train.groupBy("label", "w").agg(count(lit(1)).as("n_wc"))
    val ct = train.groupBy("label").agg(count(lit(1)).as("n_c"))
    val vocab = train.select("w").distinct()
    val vSize = vocab.agg(count(lit(1)).as("v"))

    // dense (vocab × classes) smoothed likelihood:
    // ll(w,c) = ln((n_wc + 1) / (n_c + V)) — integer-ratio operand
    val dense = vocab
      .crossJoin(broadcast(ct))
      .join(wc, Seq("label", "w"), "left")
      .crossJoin(broadcast(vSize))
      .select(col("w"), col("label").as("c"),
        log((coalesce(col("n_wc"), lit(0L)) + lit(1L)).cast("double") /
          (col("n_c") + col("v")).cast("double")).as("ll"))

    val scored = test
      .join(dense, Seq("w"))
      .groupBy(col("doc_id"), col("label"), col("c"))
      .agg(round(sum("ll"), 6).as("ll_sum"))
      .join(broadcast(priors), Seq("c"))
      .select(col("doc_id"), col("label"), col("c"),
        (col("ll_sum") + col("prior")).as("score"))
    val wArg = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("c").asc)
    scored
      .withColumn("rn", row_number().over(wArg))
      .filter(col("rn") === 1)
      .groupBy(col("label"), col("c").as("pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy("label", "pred")
  }
}
