package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data hygiene op every LLM
  * pipeline runs before a corpus ships (cf. GPT-3 appendix C / PaLM §6.1:
  * n-gram-overlap filtering of training documents against evaluation
  * sets): for each candidate document, how many of its distinct word
  * k-grams appear ANYWHERE in the benchmark corpus.
  *
  * Scale design (100 TB story): the benchmark side is small by nature
  * (eval sets are MBs, not TBs) — its distinct hashed k-gram set
  * broadcasts (AQE picks the broadcast join while it fits; at worst it is
  * one equi-join shuffle of 8-byte keys). The candidate side streams
  * through [[Dedup.shingleRows]] (posexplode + window per doc, hashed to
  * longs immediately — no raw n-gram strings ever shuffle) and ONE
  * per-doc hash aggregate. Nothing here is quadratic; cost is linear in
  * corpus tokens.
  */
object Contamination {

  /** Per-candidate-document overlap statistics against a benchmark corpus.
    *
    * @param candidates (doc_id, text, …) — the training-corpus side
    * @param benchmark  (doc_id, text, …) — the held-out/eval side
    * @param k          n-gram width (word-level, stopwords dropped —
    *                   [[Dedup.shingleRows]] semantics)
    * Output: (doc_id, n_grams, n_overlap) — one row per candidate doc
    * with ≥ 1 k-gram (docs shorter than k tokens have no n-grams and no
    * row, mirroring the SQL oracle); `n_overlap` counts the candidate's
    * DISTINCT k-grams seen in the benchmark (both sides are distinct-per-
    * doc, so the join multiplies nothing).
    */
  def ngramOverlap(candidates: DataFrame, benchmark: DataFrame,
      k: Int = 3): DataFrame = {
    // both the total and the hit count scan the candidate shingle rows —
    // persist (registry-tracked) so tokenize→window runs once
    val candSh = graft.Caches.persist(
      Dedup.shingleRows(candidates, k, hashed = true))
    val benchSh = Dedup.shingleRows(benchmark, k, hashed = true)
      .select("shingle").distinct()
    val tot = candSh.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    val hit = candSh.join(benchSh, Seq("shingle"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    tot.join(hit, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
  }
}
