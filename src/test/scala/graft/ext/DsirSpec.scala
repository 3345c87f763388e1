package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("hashedFeatures: unigram + adjacent-bigram counts over kept tokens") {
    val docs = Seq((1L, "alpha beta alpha")).toDF("doc_id", "text")
    val feat = Dsir.hashedFeatures(docs, buckets = 1024)
    // 3 unigram instances + 2 bigram instances = 5 total occurrences
    assert(feat.agg(sum("n")).head().getLong(0) == 5L)
    // "alpha" appears twice → some bucket carries n >= 2
    assert(feat.agg(max("n")).head().getLong(0) >= 2L)
  }

  test("hashedFeatures: stopwords are dropped and bigrams stitch KEPT tokens") {
    // "the" is a stopword: tokens = [alpha, beta] → 2 unigrams + the
    // gap-skipping bigram "alpha beta" = 3 occurrences
    val docs = Seq((1L, "alpha the beta")).toDF("doc_id", "text")
    val feat = Dsir.hashedFeatures(docs, buckets = 1024)
    assert(feat.agg(sum("n")).head().getLong(0) == 3L)
  }

  test("importanceWeights: target-like candidates outrank disjoint ones") {
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta", "tgt"),
      (2L, "alpha beta gamma beta alpha", "tgt"),
      (3L, "alpha beta gamma", "raw"), // shares the target's n-grams
      (4L, "zulu yankee xray whisky", "raw") // disjoint from the target
    ).toDF("doc_id", "text", "source")
    val w = Dsir.importanceWeights(docs, col("source") === "tgt", 1024)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w.keySet == Set(3L, 4L), "only non-target docs are weighted")
    assert(w(3L) > w(4L),
      s"target-like doc must outrank the disjoint one: $w")
    assert(w(3L) > 0.0 && w(4L) < 0.0,
      s"signs: shared n-grams → positive LLR, disjoint → negative: $w")
    graft.Caches.clearPersisted()
  }

  test("scoreFeatures: batching-independent against a frozen model") {
    // the stream ≡ batch property stream_dsir_score gates: scoring a
    // corpus whole equals scoring it in arbitrary batches, because a
    // doc's weight reads only its own rows + the frozen model
    val all = Seq(
      (1L, "alpha beta gamma", "tgt"),
      (2L, "alpha gamma beta alpha", "raw"),
      (3L, "omega sigma tau gamma", "raw"),
      (4L, "beta beta omega", "raw")
    ).toDF("doc_id", "text", "source")
    val tagged = Dsir.hashedFeatures(all, 256)
      .join(all.select(col("doc_id"), (col("source") === "tgt").as("tgt")),
        Seq("doc_id"))
    val model = Dsir.ratioModel(tagged, 256)
    def scores(df: org.apache.spark.sql.DataFrame) =
      Dsir.scoreFeatures(Dsir.hashedFeatures(df, 256), model)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val whole = scores(all)
    val batched = scores(all.filter(col("doc_id") <= 2)) ++
      scores(all.filter(col("doc_id") > 2))
    assert(whole == batched)
    graft.Caches.clearPersisted()
  }

  test("importanceWeights: deterministic across recomputation") {
    val docs = Seq(
      (1L, "alpha beta gamma delta", "tgt"),
      (2L, "alpha gamma beta", "raw"),
      (3L, "omega sigma tau", "raw")
    ).toDF("doc_id", "text", "source")
    def run() = {
      val r = Dsir.importanceWeights(docs, col("source") === "tgt", 64)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      graft.Caches.clearPersisted()
      r
    }
    assert(run() == run())
  }
}
