package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Golden cases for the classic Porter (1980) algorithm — end-to-end
  * outputs traced from the published rules (SURVEY.md §7.2: we pin OUR
  * stemmer; NLTK's NLTK_EXTENSIONS mode is explicitly not the target).
  */
class PorterStemmerSpec extends AnyFunSuite {
  private val golden = Seq(
    // step 1a plurals
    "caresses" -> "caress",
    "flies" -> "fli",
    "mules" -> "mule",
    "cats" -> "cat",
    "caress" -> "caress",
    // step 1b -ed/-ing (+ cleanup rules)
    "feed" -> "feed",
    "agreed" -> "agre",
    "plastered" -> "plaster",
    "motoring" -> "motor",
    "sing" -> "sing",
    "denied" -> "deni",
    "died" -> "di",
    "hopping" -> "hop",
    "tanned" -> "tan",
    "falling" -> "fall",
    "hissing" -> "hiss",
    "failing" -> "fail",
    "filing" -> "file",
    // step 1c y -> i
    "happy" -> "happi",
    "sky" -> "sky",
    // multi-step classics
    "relational" -> "relat",
    "conditional" -> "condit",
    "rational" -> "ration",
    "electricity" -> "electr",
    "hopeful" -> "hope",
    "goodness" -> "good",
    "generalization" -> "gener",
    "oscillators" -> "oscil",
    "controlling" -> "control",
    "roll" -> "roll",
    // short words unchanged
    "a" -> "a",
    "is" -> "is",
    "be" -> "be")

  test("golden stems") {
    golden.foreach { case (in, want) =>
      assert(PorterStemmer.stem(in) == want, s"stem($in)")
    }
  }

  test("idempotent on already-stemmed common words") {
    Seq("motor", "hop", "tan", "fall", "file").foreach { w =>
      assert(PorterStemmer.stem(PorterStemmer.stem(w)) == PorterStemmer.stem(w))
    }
  }

  test("non-alpha input returned unchanged") {
    assert(PorterStemmer.stem("abc123") == "abc123")
    assert(PorterStemmer.stem("") == "")
  }
}
