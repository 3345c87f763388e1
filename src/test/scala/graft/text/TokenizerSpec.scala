package graft.text

import org.apache.spark.sql.functions.col
import graft.SparkSpec

class TokenizerSpec extends SparkSpec {

  test("driver-side tokenize: case folding, punctuation, stopwords") {
    // "Don't" → pre-split "do" (NLTK's word_tokenize+isalpha residue),
    // and "do" is an NLTK stopword — the word disappears entirely,
    // matching the reference's observable output (SURVEY.md §7.4)
    assert(Tokenizer.tokenize("Don't the PARTIES understand?", stem = false) ==
      Seq("parties", "understand"))
    assert(Tokenizer.tokenize("Don't the PARTIES understand?", stem = true) ==
      Seq("parti", "understand"))
  }

  test("contraction pre-split reproduces NLTK word_tokenize + isalpha") {
    // treebank suffix splits, quirks included: can't → ["ca","n't"] →
    // "ca"; won't → ["wo","n't"] → "wo" (neither is a stopword)
    assert(Tokenizer.tokenize("It's o'clock, isn't it? can't won't",
      stem = false) == Seq("ca", "wo"))
    // 's strips from non-stopword hosts; internal-apostrophe words
    // ("o'clock", "rock'n'roll") drop whole like any non-isalpha token
    assert(Tokenizer.tokenize("Claude's plan they've shipped rock'n'roll",
      stem = false) == Seq("claude", "plan", "shipped"))
    // trailing possessive apostrophe (parties') has no letter after it:
    // neither rule fires and the bare word survives, as in NLTK
    assert(Tokenizer.tokenize("the parties' motion", stem = false) ==
      Seq("parties", "motion"))
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
      "It's o'clock — can't they've won't rock'n'roll parties'",
      "")
    val df = texts.toDF("text")
    for (stem <- Seq(false, true)) {
      val got = df.select(Tokenizer.tokensCol(col("text"), stem)).as[Seq[String]].collect()
      val want = texts.map(t => Tokenizer.tokenize(t, stem))
      assert(got.toSeq == want, s"stem=$stem")
    }
  }
}
