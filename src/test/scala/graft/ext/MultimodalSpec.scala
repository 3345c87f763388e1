package graft.ext

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("media table carries binary payload with typed metadata") {
    import spark.implicits._
    val docs = Seq((1L, "hello", "en", "src1", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val m = Multimodal.asMediaTable(docs)
    assert(m.schema("payload").dataType.typeName == "binary")
    val row = m.select("media_id", "meta.mime", "meta.n_bytes", "meta.source")
      .as[(Long, String, Long, String)].head()
    assert(row == ((1L, "text/plain", 5L, "src1")))
  }

  test("mapPartitions feature extraction produces deterministic fake features") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abcd", "en", "s", 4L),
      (2L, "", "en", "s", 0L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val f = Multimodal.extractFeatures(Multimodal.asMediaTable(docs))
      .as[(Long, Long, Double, Int, Int)].collect().map(r => r._1 -> r).toMap
    // "abcd": bytes 97..100, mean 98.5, w=2, h=2
    assert(f(1L) == ((1L, 4L, 98.5, 2, 2)))
    // empty payload: n=0, mean 0, dims 1x1
    assert(f(2L) == ((2L, 0L, 0.0, 1, 1)))
  }
}
