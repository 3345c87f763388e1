package graft.index

import java.nio.file.Files
import graft.SparkSpec

/** S3 sink path: persist all reference-shaped index artifacts
  * (SURVEY.md §1.1) and read them back.
  */
class ArtifactsSpec extends SparkSpec {

  test("writeArtifacts round-trips all eight artifact tables") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "merge sort merge"),
      (2L, "hash join sort")).toDF("doc_id", "text")
    val t = Indexer.build(corpus, stem = false)
    val dir = Files.createTempDirectory("graft-artifacts").toString
    Indexer.writeArtifacts(spark, t, dir,
      opinionText = Some(corpus.select($"doc_id", $"text".as("opinion_text"))),
      preprocessedDocs = Some(Indexer.preprocessedDocs(corpus, stem = false)))

    def n(name: String): Long = spark.read.parquet(s"$dir/$name.parquet").count()
    assert(n("flat_words") == 6)
    assert(n("doc_lengths") == 2)
    assert(n("term_frequencies") == 5)
    assert(n("idf_values") == 4)
    assert(n("inverted_index") == 4)
    assert(n("opinion_text") == 2) // the reference's seventh artifact
    val params = spark.read.parquet(s"$dir/scoring_params.parquet")
      .as[Double].collect()
    assert(params.toSeq == Seq(3.0)) // avgdl = (3 + 3) / 2

    // the reference's FIRST persisted table (searchenginespark.py:74-77):
    // raw columns preserved + words:array<string>, schema round-trips
    val pre = spark.read.parquet(s"$dir/preprocessed_docs.parquet")
    assert(pre.columns.toSeq == Seq("doc_id", "text", "words"))
    assert(pre.schema("words").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType == org.apache.spark.sql.types.StringType)
    val words = pre.select($"doc_id", $"words").as[(Long, Seq[String])]
      .collect().toMap
    assert(words(1L) == Seq("merge", "sort", "merge"))
    assert(words(2L) == Seq("hash", "join", "sort"))
  }

  test("loadArtifacts serves an index identical to the built one") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "merge sort merge table scan"),
      (2L, "hash join sort table"),
      (3L, "scan scan merge")).toDF("doc_id", "text")
    val built = Indexer.build(corpus, stem = false)
    val dir = Files.createTempDirectory("graft-serve").toString
    Indexer.writeArtifacts(spark, built, dir)
    val loaded = Indexer.loadArtifacts(spark, dir)

    assert(loaded.nDocs == built.nDocs)
    assert(loaded.avgdl == built.avgdl) // double round-trips parquet exactly
    def score(t: IndexTables) = graft.search.Search
      .scoreTerms(t, Seq("merge", "scan"))
      .as[(Long, Double)].collect().toSeq
    assert(score(loaded) == score(built)) // bitwise-equal scores
  }
}
