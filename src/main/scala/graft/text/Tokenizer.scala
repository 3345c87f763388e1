package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis chain replacing the reference's NLTK Python UDFs
  * (`preprocess_text_udf` at `searchenginespark.py:57-65`, query-side
  * variant at `pyapp.py:55-61`).
  *
  * Design (SURVEY.md §7.2): everything except stemming is *native Column
  * expressions* — `lower` → `split("[^a-z]+")` → higher-order `filter` —
  * so the whole chain stays inside WholeStageCodegen; the reference's
  * Python-UDF boundary (pickling every opinion text, SURVEY.md §4) simply
  * does not exist here. Stemming is the one custom kernel — a native
  * Catalyst expression with codegen ([[graft.functions.PorterStem]] over
  * [[PorterStemmer]]) — applied as the *last* step so the earlier chain
  * has already shrunk the data.
  *
  * Tokenizer semantics (documented divergence from NLTK, SURVEY.md §7.4):
  * splitting on `[^a-z]+` after lowercasing subsumes the reference's
  * `isalpha` filter (`searchenginespark.py:61`) — every emitted token is
  * alphabetic by construction. Contractions are handled by a pre-split
  * rule (r16 VERDICT #9) reproducing NLTK word_tokenize + isalpha:
  * treebank contraction suffixes (n't / 's / 're / 've / 'll / 'm / 'd)
  * are stripped at word end ("don't" → ["do"], "can't" → ["ca"] — NLTK's
  * own splits, quirks included), and words with an INTERNAL apostrophe
  * ("o'clock", "rock'n'roll") are dropped whole, exactly as one
  * non-isalpha token would be. Both rules are two codegen
  * regexp_replace passes — still zero UDFs, still narrow. The gate
  * corpus is pure `[a-z ]` text, so the rules are oracle-invisible;
  * TokenizerSpec's goldens pin them. The reference's query path omits
  * the isalpha filter (`pyapp.py:55-61` vs `:44-52`); with a `[^a-z]+`
  * splitter that asymmetry is a no-op, which we document rather than
  * emulate.
  *
  * 100 TB note: tokenization is embarrassingly parallel (narrow, no
  * shuffle); cost is linear in input bytes and fully distributed. The
  * stopword list is a 179-element literal array compiled into the plan —
  * no broadcast join needed at any scale.
  */
object Tokenizer {

  /** Stopword set as an array literal usable inside codegen'd lambdas. */
  private val stopArray: Column = array(Stopwords.alphaOnly.map(lit): _*)

  /** Treebank contraction suffixes, stripped at word end (what NLTK's
    * word_tokenize splits off and isalpha then drops).
    */
  private[text] val ContractionSuffix = "(n't|'re|'ve|'ll|'s|'m|'d)(?=[^a-z]|$)"

  /** A word with an internal apostrophe ("o'clock") — one non-alpha
    * token under NLTK, so it drops whole.
    */
  private[text] val InternalApostrophe = "[a-z]+'[a-z][a-z']*"

  private def preSplit(lowered: Column): Column =
    regexp_replace(
      regexp_replace(lowered, ContractionSuffix, " "),
      InternalApostrophe, " ")

  private def stemAll(ws: Column): Column =
    transform(ws, w => graft.functions.PorterStem.stem(w))

  /** `text` → array of lowercase alphabetic non-stopword tokens.
    * @param stem apply Porter stemming (the reference's document path does;
    *             oracle-checked queries use stem=false so the DuckDB oracle
    *             never needs a stemmer, SURVEY.md §5)
    */
  def tokensCol(text: Column, stem: Boolean = true): Column = {
    val raw = split(preSplit(lower(text)), "[^a-z]+")
    val kept = filter(raw, w =>
      length(w) > 0 && !array_contains(stopArray, w))
    if (stem) stemAll(kept) else kept
  }

  /** Driver-side tokenizer for short query strings (`pyapp.py:55-61` runs
    * its query preprocessing driver-side too — a one-line query needs no
    * distribution). Identical semantics to [[tokensCol]].
    */
  def tokenize(text: String, stem: Boolean = true): Seq[String] = {
    val kept = text.toLowerCase
      .replaceAll(ContractionSuffix, " ")
      .replaceAll(InternalApostrophe, " ")
      .split("[^a-z]+").toSeq
      .filter(w => w.nonEmpty && !Stopwords.englishSet.contains(w))
    if (stem) kept.map(PorterStemmer.stem) else kept
  }
}
