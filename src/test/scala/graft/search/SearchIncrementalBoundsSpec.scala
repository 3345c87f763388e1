package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.index.Indexer

/** Incremental MaxScore-bounds maintenance (the r12 VERDICT #6 shape,
  * gated by `search_pruned_incremental`): per-batch (word, tf, min dl)
  * skyline state merged across batches must reproduce the batch
  * [[Search.termBounds]] bit-for-bit, and pruned serving off the
  * merged bounds must equal the unpruned plan.
  */
class SearchIncrementalBoundsSpec extends SparkSpec {

  private lazy val corpus = {
    import spark.implicits._
    val a = (1L to 30L).map(i => (i, s"data merge data join row${i} table"))
    val b = (31L to 45L).map(i => (i, s"zebra scan merge row${i}"))
    (a ++ b).toDF("doc_id", "text")
  }

  // the skyline state + mergeable-global-stats rebuild, exactly the
  // gate query's shape but over the spec corpus split at doc_id 23
  private def mergedBounds: DataFrame = {
    def flatFor(p: org.apache.spark.sql.Column) =
      Indexer.flatWords(corpus.filter(p), stem = false)
    val oldFlat = flatFor(col("doc_id") < 23)
    val newFlat = flatFor(col("doc_id") >= 23)
    def state(flat: DataFrame) =
      Indexer.termFrequencies(flat)
        .join(Indexer.docLengths(flat), Seq("doc_id"))
        .groupBy("word", "term_freq").agg(min("doc_length").as("min_dl"))
    def lenStats(flat: DataFrame) = Indexer.docLengths(flat)
      .agg(count(lit(1)).as("n"), sum("doc_length").as("s")).head()
    val (r1, r2) = (lenStats(oldFlat), lenStats(newFlat))
    val n = r1.getLong(0) + r2.getLong(0)
    val avgdl = (r1.getLong(1) + r2.getLong(1)).toDouble / n.toDouble
    def dfPartial(flat: DataFrame) = flat.select("word", "doc_id").distinct()
      .groupBy("word").agg(count(lit(1)).as("df"))
    val idf = dfPartial(oldFlat).unionByName(dfPartial(newFlat))
      .groupBy("word").agg(sum("df").as("doc_freq"))
      .withColumn("idf", log10(lit(n.toDouble) / col("doc_freq")))
    state(oldFlat).unionByName(state(newFlat))
      .groupBy("word", "term_freq").agg(min("min_dl").as("min_dl"))
      .join(idf.select("word", "idf"), Seq("word"))
      .withColumn("partial", BM25.score(col("term_freq"), col("min_dl"),
        col("idf"), lit(avgdl)))
      .groupBy("word").agg(max("partial").as("ub"))
  }

  private lazy val t = Indexer.build(corpus, stem = false)

  test("delta-merged bounds equal the batch termBounds bit-for-bit") {
    val batch = Search.termBounds(t).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val merged = mergedBounds.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(merged.keySet == batch.keySet)
    merged.foreach { case (w, ub) =>
      assert(java.lang.Double.doubleToLongBits(ub) ==
        java.lang.Double.doubleToLongBits(batch(w)), s"word $w: $ub != ${batch(w)}")
    }
  }

  test("pruned serving off the merged bounds equals the unpruned plan") {
    val terms = Seq("zebra", "data", "merge")
    val pruned = Search.prunedTopK(t, mergedBounds, terms, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val unpruned = Search.scoreTerms(t, terms)
      .withColumn("score", round(col("score"), 4))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(pruned == unpruned)
  }
}
