package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The codegen [[RollingHash]] must reproduce the interpreted
  * `aggregate(transform(sequence(...)))` fold it replaced (r4 VERDICT #6)
  * value-for-value, or the `fingerprint_rolling` oracle hash would drift.
  */
class RollingHashSpec extends SparkSpec {

  /** The exact HOF form used through round 4. */
  private def hofFingerprint(text: org.apache.spark.sql.Column, maxChars: Int) = {
    val prefix = substring(text, 1, maxChars)
    aggregate(
      transform(sequence(lit(1), length(prefix)),
        i => ascii(substr(prefix, i, lit(1))).cast("long")),
      lit(0L),
      (acc, c) => (acc * 131L + c) % 1000000007L)
  }

  test("identical to the interpreted HOF fold on the real documents table") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bad = d.select(
      RollingHash.hash(col("text"), 200).as("a"),
      hofFingerprint(col("text"), 200).as("b"))
      .filter(col("a") =!= col("b"))
    assert(bad.count() == 0)
  }

  test("edge cases: empty, short, exactly-max, non-ascii, null") {
    import spark.implicits._
    val rows = Seq(Some(""), Some("a"), Some("ab"), Some("x" * 200),
      Some("x" * 201), Some("héllo wörld"), Some("日本語テキスト"), None)
    val df = rows.toDF("text")
    val got = df.select(RollingHash.hash(col("text"), 200)).as[Option[Long]].collect()
    val want = df.select(hofFingerprint(col("text"), 200)).as[Option[Long]].collect()
    assert(got.toSeq == want.toSeq)
    assert(got.head == Some(0L)) // empty string folds to 0 (HOF parity)
    assert(got.last == None)
  }

  test("kernel matches a direct scala fold") {
    val s = "The quick brown fox."
    val want = s.take(200).foldLeft(0L)((acc, ch) => (acc * 131L + ch.toInt) % 1000000007L)
    assert(RollingHash.hashUTF8(
      org.apache.spark.unsafe.types.UTF8String.fromString(s), 200) == want)
  }
}
