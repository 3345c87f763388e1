package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {

  test("quality metrics on a known string") {
    import spark.implicits._
    // tokens: the(3) quick(5) brown(5) fox(3) -> 16 chars of tokens
    val df = Seq((1L, "The quick brown fox!!")).toDF("doc_id", "text")
    val m = TextAnalysis.qualityMetrics(df)
      .select("n_tokens", "mean_token_len", "stopword_ratio", "alpha_ratio")
      .as[(Long, Double, Double, Double)].head()
    assert(m._1 == 4)
    assert(m._2 == 4.0)
    assert(m._3 == 0.25) // "the" of 4 tokens
    assert(m._4 == 16.0 / 21) // 16 letters of 21 chars
  }

  test("empty and null text yield zeroed metrics and 'und' language") {
    import spark.implicits._
    val df = Seq((1L, Some("")), (2L, None))
      .toDF("doc_id", "text")
    val m = TextAnalysis.qualityMetrics(df)
      .select("doc_id", "n_tokens", "mean_token_len", "stopword_ratio", "alpha_ratio")
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(m(1L) == ((0L, 0.0, 0.0, 0.0)))
    assert(m(2L) == ((0L, 0.0, 0.0, 0.0)))
    val langs = TextAnalysis.languageId(df)
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(langs(1L) == "und" && langs(2L) == "und")
  }

  test("language id picks the profile with most marker hits") {
    import spark.implicits._
    val df = Seq(
      (1L, "der Hund und die Katze das ist gut"),
      (2L, "the cat and the dog is that it for"),
      (3L, "el perro y la casa de los gatos"),
      (4L, "xyzzy plugh qwerty")).toDF("doc_id", "text")
    val got = TextAnalysis.languageId(df)
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(got(1L) == "de")
    assert(got(2L) == "en")
    assert(got(3L) == "es")
    assert(got(4L) == "und")
  }

  test("token counts: whitespace vs bpe-ish") {
    import spark.implicits._
    val df = Seq((1L, "Hello world-42, ok?")).toDF("doc_id", "text")
    val got = df.select(
      TextAnalysis.wsTokenCount(col("text")).as("ws"),
      TextAnalysis.bpeishTokenCount(col("text")).as("bpe"))
      .as[(Int, Int)].head()
    assert(got._1 == 3) // Hello | world-42, | ok?
    // hello|world|-|42|,|ok|? -> 7
    assert(got._2 == 7)
  }

  test("rolling fingerprint matches a driver-side reimplementation") {
    import spark.implicits._
    val texts = Seq("abc", "spark engine", "a" * 300)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
      TextAnalysis.rollingFingerprint(col("text"), 200).as("fp"))
      .as[(Long, Long)].collect().toMap
    def expected(t: String): Long =
      t.take(200).foldLeft(0L)((h, c) => (h * 131 + c.toLong) % 1000000007L)
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == expected(t), s"text $i")
    }
  }
}
