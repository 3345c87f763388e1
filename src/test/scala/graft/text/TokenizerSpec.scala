package graft.text

import org.apache.spark.sql.functions.col
import graft.SparkSpec

class TokenizerSpec extends SparkSpec {

  test("driver-side tokenize: case folding, punctuation, stopwords") {
    // "don" and "t" are both NLTK stopwords — "Don't" disappears entirely,
    // matching the reference's observable output (SURVEY.md §7.4)
    assert(Tokenizer.tokenize("Don't the PARTIES understand?", stem = false) ==
      Seq("parties", "understand"))
    assert(Tokenizer.tokenize("Don't the PARTIES understand?", stem = true) ==
      Seq("parti", "understand"))
  }

  test("numbers and symbols split tokens (isalpha subsumed)") {
    assert(Tokenizer.tokenize("case-law 42 sec. 7(b)", stem = false) ==
      Seq("case", "law", "sec", "b"))
  }

  test("empty and stopword-only inputs") {
    assert(Tokenizer.tokenize("", stem = false).isEmpty)
    assert(Tokenizer.tokenize("the of and", stem = false).isEmpty)
  }

  test("tokensCol matches driver-side tokenize") {
    import spark.implicits._
    val texts = Seq(
      "The quick brown foxes were jumping over lazy dogs!",
      "Don't stop BELIEVING; hold-on 2 that feeling.",
      "")
    val df = texts.toDF("text")
    for (stem <- Seq(false, true)) {
      val got = df.select(Tokenizer.tokensCol(col("text"), stem)).as[Seq[String]].collect()
      val want = texts.map(t => Tokenizer.tokenize(t, stem))
      assert(got.toSeq == want, s"stem=$stem")
    }
  }
}
