package graft.text

/** The NLTK English stopword list (179 entries), reproduced as a constant.
  *
  * The reference removes these inside its Python tokenizer UDF
  * (`searchenginespark.py:58-62`, `pyapp.py:44-52` — `stopwords.words("english")`).
  * The list itself is public data shipped with NLTK; we inline it so the
  * engine has zero runtime dependencies.
  *
  * Note: entries containing apostrophes ("don't", "should've", …) can never
  * match tokens produced by our `[^a-z]+` splitter (the splitter already
  * breaks "don't" into "don" + "t", both of which are separately in this
  * list) — they are kept for fidelity and for callers that tokenize
  * differently.
  */
object Stopwords {
  val english: Seq[String] = Seq(
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves",
    "you", "you're", "you've", "you'll", "you'd", "your", "yours",
    "yourself", "yourselves", "he", "him", "his", "himself", "she",
    "she's", "her", "hers", "herself", "it", "it's", "its", "itself",
    "they", "them", "their", "theirs", "themselves", "what", "which",
    "who", "whom", "this", "that", "that'll", "these", "those", "am",
    "is", "are", "was", "were", "be", "been", "being", "have", "has",
    "had", "having", "do", "does", "did", "doing", "a", "an", "the",
    "and", "but", "if", "or", "because", "as", "until", "while", "of",
    "at", "by", "for", "with", "about", "against", "between", "into",
    "through", "during", "before", "after", "above", "below", "to",
    "from", "up", "down", "in", "out", "on", "off", "over", "under",
    "again", "further", "then", "once", "here", "there", "when",
    "where", "why", "how", "all", "any", "both", "each", "few", "more",
    "most", "other", "some", "such", "no", "nor", "not", "only", "own",
    "same", "so", "than", "too", "very", "s", "t", "can", "will",
    "just", "don", "don't", "should", "should've", "now", "d", "ll",
    "m", "o", "re", "ve", "y", "ain", "aren", "aren't", "couldn",
    "couldn't", "didn", "didn't", "doesn", "doesn't", "hadn", "hadn't",
    "hasn", "hasn't", "haven", "haven't", "isn", "isn't", "ma",
    "mightn", "mightn't", "mustn", "mustn't", "needn", "needn't",
    "shan", "shan't", "shouldn", "shouldn't", "wasn", "wasn't",
    "weren", "weren't", "won", "won't", "wouldn", "wouldn't")

  val englishSet: Set[String] = english.toSet

  /** The subset that can actually appear post-`[^a-z]+`-split (pure a-z). */
  val alphaOnly: Seq[String] = english.filter(_.forall(c => c >= 'a' && c <= 'z'))

  /** SQL literal IN-list of the alpha-only stopwords, for DuckDB oracles. */
  def sqlInList: String = alphaOnly.map(w => s"'$w'").mkString("(", ",", ")")
}
