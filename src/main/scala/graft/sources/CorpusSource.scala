package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest for the reference's nested corpus shape — Harvard CAP case-law
  * JSONL (schema recovered from the Parquet footers, SURVEY.md §1.1 and
  * FIXTURES.md §C). The reference reads it with schema inference
  * (`spark.read.json` at `searchenginespark.py:15-16`); at 100 TB inference
  * is a full extra pass over the data, so we pass the explicit StructType.
  */
object CorpusSource {

  /** The CAP corpus schema (FIXTURES.md §C; reference
    * `preprocessed_docs.parquet` footer).
    */
  val capSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("name_abbreviation", StringType),
    StructField("decision_date", StringType),
    StructField("docket_number", StringType),
    StructField("first_page", StringType),
    StructField("last_page", StringType),
    StructField("court", StructType(Seq(
      StructField("id", LongType),
      StructField("jurisdiction_url", StringType),
      StructField("name", StringType),
      StructField("name_abbreviation", StringType),
      StructField("slug", StringType)))),
    StructField("jurisdiction", StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("name_long", StringType),
      StructField("slug", StringType),
      StructField("whitelisted", BooleanType)))),
    StructField("citations", ArrayType(StructType(Seq(
      StructField("cite", StringType),
      StructField("type", StringType))))),
    StructField("reporter", StructType(Seq(
      StructField("full_name", StringType)))),
    StructField("volume", StructType(Seq(
      StructField("volume_number", StringType)))),
    StructField("casebody", StructType(Seq(
      StructField("data", StructType(Seq(
        StructField("attorneys", ArrayType(StringType)),
        StructField("head_matter", StringType),
        StructField("judges", ArrayType(StringType)),
        StructField("opinions", ArrayType(StructType(Seq(
          StructField("author", StringType),
          StructField("text", StringType),
          StructField("type", StringType))))),
        StructField("parties", ArrayType(StringType))))),
      StructField("status", StringType))))))

  /** S1: JSONL corpus scan with explicit schema (no inference pass). */
  def readJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(capSchema).json(path)

  /** A1 + P1: one row per opinion — explode `casebody.data.opinions` and
    * project the nested fields (`searchenginespark.py:74-77`). Null
    * casebodies and empty opinion arrays disappear (explode semantics),
    * matching the reference.
    * Output: (doc_id, opinion_author, opinion_type, opinion_text).
    */
  def explodeOpinions(corpus: DataFrame): DataFrame =
    corpus
      .withColumn("opinion", explode(col("casebody.data.opinions")))
      .select(
        col("id").as("doc_id"),
        col("opinion.author").as("opinion_author"),
        col("opinion.type").as("opinion_type"),
        col("opinion.text").as("opinion_text"))

  /** A3/U4: all opinion texts of a case concatenated into one document
    * string (`nltksearchv1.py:103-116` done natively — array_join over
    * transform, no UDF). Cases with no opinions yield an empty string.
    * Output: (doc_id, full_text).
    */
  def concatOpinions(corpus: DataFrame): DataFrame =
    corpus.select(
      col("id").as("doc_id"),
      coalesce(
        array_join(transform(col("casebody.data.opinions"), o => o("text")), " "),
        lit("")).as("full_text"))

  /** The deterministic per-case display text (the reference's
    * `opinion_text` artifact keeps 1,107 rows for 1,000 cases and the app
    * picks `collect()[0]` arbitrarily — SURVEY.md §3.1; we pick the FIRST
    * opinion by array position, deterministically).
    * Output: (doc_id, opinion_text).
    */
  def firstOpinionText(corpus: DataFrame): DataFrame =
    corpus
      .filter(size(col("casebody.data.opinions")) > 0)
      .select(col("id").as("doc_id"),
        element_at(col("casebody.data.opinions"), 1)("text").as("opinion_text"))
}
