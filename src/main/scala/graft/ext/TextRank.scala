package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TextRank keyword extraction (Mihalcea & Tarau, "TextRank: Bringing
  * Order into Text", EMNLP'04) at corpus level: a fixed-iteration
  * weighted PageRank over the word co-occurrence graph — the classic
  * unsupervised keyword/keyphrase signal a curation pipeline runs to
  * characterize a corpus slice.
  *
  * Graph: nodes = non-stopword tokens; undirected edges between adjacent
  * tokens, weighted by the number of DOCUMENTS containing the adjacency
  * (per-doc distinct, the [[Dedup.shingleRows]] k=2 semantics — robust
  * to within-doc repetition). Rank: PRₜ₊₁(v) = (1−d)/N + d·Σ_{u∼v}
  * w(u,v)/wdeg(u)·PRₜ(u), d = 0.85, a FIXED `iters` power iterations
  * (no convergence test — deterministic work, mirrorable in unrolled
  * SQL CTEs).
  *
  * Scale design: the graph is VOCABULARY-bounded (nodes = distinct
  * tokens — ~1e6 for a web corpus — regardless of corpus bytes); edge
  * construction is the linear shingle pass + one hash agg on "u v"
  * keys; each iteration is one equi-join + hash agg over edge rows.
  * Nothing is quadratic in the corpus; the rank table is broadcast-size.
  *
  * Determinism: every arithmetic step uses the same operand shapes as
  * the SQL oracle (w·pr/wdeg products summed, then (1−d)/N + d·Σ);
  * distributed summation order wobble is ~1e-16 over vocabulary-sized
  * sums and is absorbed by the caller's 6dp rounding.
  */
object TextRank {

  /** Top-`topK` corpus keywords by TextRank score.
    * Output: (word, tr_score) ordered by score desc, word asc.
    */
  def keywords(docs: DataFrame, iters: Int = 3, damping: Double = 0.85,
      topK: Int = 20): DataFrame = {
    // per-doc distinct adjacencies → cross-doc edge weights
    val bi = Dedup.shingleRows(docs, k = 2)
      .groupBy("shingle").agg(count(lit(1)).as("w"))
      .select(split(col("shingle"), " ").getItem(0).as("u"),
        split(col("shingle"), " ").getItem(1).as("v"), col("w"))
      .filter(col("u") =!= col("v")) // immediate repetition = self-loop; drop
    // symmetrize: "a b" and "b a" adjacencies merge into one undirected
    // edge weight, materialized in both orientations for the join
    val edges = graft.Caches.persist(
      bi.unionByName(bi.select(col("v").as("u"), col("u").as("v"), col("w")))
        .groupBy("u", "v").agg(sum("w").as("w")))
    val wdeg = graft.Caches.persist(edges.groupBy("u").agg(sum("w").as("wdeg")))
    val n = wdeg.count() // S4 scalar: node count (vocabulary-bounded)
    var pr = wdeg.select(col("u").as("node"), lit(1.0 / n).as("pr"))
    for (_ <- 1 to iters) {
      val contrib: Column = col("w") * col("pr") / col("wdeg")
      pr = edges
        .join(wdeg, Seq("u"))
        .join(pr.withColumnRenamed("node", "u"), Seq("u"))
        .groupBy(col("v"))
        .agg(sum(contrib).as("in_rank"))
        .select(col("v").as("node"),
          (lit((1.0 - damping) / n) + lit(damping) * col("in_rank")).as("pr"))
    }
    pr.select(col("node").as("word"), round(col("pr"), 6).as("tr_score"))
      .orderBy(col("tr_score").desc, col("word").asc)
      .limit(topK)
  }
}
