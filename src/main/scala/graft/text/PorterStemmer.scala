package graft.text

/** Classic Porter stemmer (M.F. Porter, "An algorithm for suffix stripping",
  * Program 14(3) 1980) — pure Scala, zero dependencies.
  *
  * This replaces the reference's NLTK `PorterStemmer` call inside its Python
  * tokenizer UDF (`searchenginespark.py:63-64`, `pyapp.py:50-51`). NLTK
  * defaults to its NLTK_EXTENSIONS mode which deviates slightly from the
  * published algorithm; per SURVEY.md §7.2 we implement the *classic*
  * algorithm and pin our own outputs with golden tests — the DuckDB
  * correctness oracle is structured to never need a stemmer.
  *
  * Thread-safe and allocation-light: operates on a char array per call, so
  * it is safe to invoke from a Spark UDF / expression on executor threads.
  */
object PorterStemmer {

  /** Stem one lowercase word. Words of length <= 2 are returned unchanged
    * (per the original algorithm's guard). Non-alphabetic input is returned
    * unchanged — callers are expected to have filtered to [a-z]+ already.
    */
  def stem(word: String): String = {
    if (word.length <= 2) return word
    if (!word.forall(c => c >= 'a' && c <= 'z')) return word
    val s = new Stepper(word.toCharArray, word.length - 1)
    s.step1ab(); s.step1c(); s.step2(); s.step3(); s.step4(); s.step5()
    new String(s.b, 0, s.k + 1)
  }

  // Mutable single-use helper mirroring the structure of the published
  // algorithm: b = buffer, k = index of last char of current stem, j = index
  // set by ends() to the char before the matched suffix.
  private final class Stepper(val b: Array[Char], var k: Int) {
    var j: Int = 0

    private def cons(i: Int): Boolean = b(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y' => if (i == 0) true else !cons(i - 1)
      case _ => true
    }

    /** m() = number of VC sequences in b[0..j]. */
    private def m(): Int = {
      var n = 0
      var i = 0
      while (i <= j && cons(i)) i += 1
      if (i > j) return 0
      while (true) {
        while (i <= j && !cons(i)) i += 1
        if (i > j) return n
        n += 1
        while (i <= j && cons(i)) i += 1
        if (i > j) return n
      }
      n
    }

    /** b[0..j] contains a vowel. */
    private def vowelInStem(): Boolean = (0 to j).exists(i => !cons(i))

    /** b[i-1..i] is a double consonant. */
    private def doubleC(i: Int): Boolean =
      i >= 1 && b(i) == b(i - 1) && cons(i)

    /** b[i-2..i] is consonant-vowel-consonant with final not w/x/y (the *o
      * condition of step 1b / 5).
      */
    private def cvc(i: Int): Boolean = {
      if (i < 2 || !cons(i) || cons(i - 1) || !cons(i - 2)) return false
      val c = b(i)
      c != 'w' && c != 'x' && c != 'y'
    }

    /** b[0..k] ends with s; if so set j to the char before the suffix. */
    private def ends(s: String): Boolean = {
      val l = s.length
      if (l > k + 1) return false
      var i = 0
      while (i < l) {
        if (b(k - l + 1 + i) != s.charAt(i)) return false
        i += 1
      }
      j = k - l
      true
    }

    /** Overwrite b[j+1..] with s and adjust k. */
    private def setTo(s: String): Unit = {
      var i = 0
      while (i < s.length) { b(j + 1 + i) = s.charAt(i); i += 1 }
      k = j + s.length
    }

    private def r(s: String): Unit = if (m() > 0) setTo(s)

    /** Step 1ab: plurals and -ed / -ing. */
    def step1ab(): Unit = {
      if (b(k) == 's') {
        if (ends("sses")) k -= 2
        else if (ends("ies")) setTo("i")
        else if (b(k - 1) != 's') k -= 1
      }
      if (ends("eed")) { if (m() > 0) k -= 1 }
      else if ((ends("ed") || ends("ing")) && vowelInStem()) {
        k = j
        if (ends("at")) setTo("ate")
        else if (ends("bl")) setTo("ble")
        else if (ends("iz")) setTo("ize")
        else if (doubleC(k)) {
          k -= 1
          val c = b(k)
          if (c == 'l' || c == 's' || c == 'z') k += 1
        } else if (m() == 1 && cvc(k)) setTo("e")
      }
    }

    /** Step 1c: y -> i when there is another vowel in the stem. */
    def step1c(): Unit =
      if (ends("y") && vowelInStem()) b(k) = 'i'

    /** Step 2: double-suffix reductions (m > 0). */
    def step2(): Unit = {
      if (k == 0) return
      b(k - 1) match {
        case 'a' =>
          if (ends("ational")) r("ate")
          else if (ends("tional")) r("tion")
        case 'c' =>
          if (ends("enci")) r("ence")
          else if (ends("anci")) r("ance")
        case 'e' =>
          if (ends("izer")) r("ize")
        case 'l' =>
          if (ends("bli")) r("ble") // paper: abli -> able; Porter's own
          else if (ends("alli")) r("al") //  later revision uses bli -> ble
          else if (ends("entli")) r("ent")
          else if (ends("eli")) r("e")
          else if (ends("ousli")) r("ous")
        case 'o' =>
          if (ends("ization")) r("ize")
          else if (ends("ation")) r("ate")
          else if (ends("ator")) r("ate")
        case 's' =>
          if (ends("alism")) r("al")
          else if (ends("iveness")) r("ive")
          else if (ends("fulness")) r("ful")
          else if (ends("ousness")) r("ous")
        case 't' =>
          if (ends("aliti")) r("al")
          else if (ends("iviti")) r("ive")
          else if (ends("biliti")) r("ble")
        case 'g' =>
          if (ends("logi")) r("log") // Porter's published revision
        case _ => ()
      }
    }

    /** Step 3: -ic-, -full, -ness etc. (m > 0). */
    def step3(): Unit = b(k) match {
      case 'e' =>
        if (ends("icate")) r("ic")
        else if (ends("ative")) r("")
        else if (ends("alize")) r("al")
      case 'i' =>
        if (ends("iciti")) r("ic")
      case 'l' =>
        if (ends("ical")) r("ic")
        else if (ends("ful")) r("")
      case 's' =>
        if (ends("ness")) r("")
      case _ => ()
    }

    /** Step 4: strip residual suffixes when m > 1. */
    def step4(): Unit = {
      if (k == 0) return
      val matched = b(k - 1) match {
        case 'a' => ends("al")
        case 'c' => ends("ance") || ends("ence")
        case 'e' => ends("er")
        case 'i' => ends("ic")
        case 'l' => ends("able") || ends("ible")
        case 'n' => ends("ant") || ends("ement") || ends("ment") || ends("ent")
        case 'o' => (ends("ion") && j >= 0 && (b(j) == 's' || b(j) == 't')) || ends("ou")
        case 's' => ends("ism")
        case 't' => ends("ate") || ends("iti")
        case 'u' => ends("ous")
        case 'v' => ends("ive")
        case 'z' => ends("ize")
        case _ => false
      }
      if (matched && m() > 1) k = j
    }

    /** Step 5: final -e removal and -ll reduction. */
    def step5(): Unit = {
      j = k
      if (b(k) == 'e') {
        val a = m()
        if (a > 1 || (a == 1 && !cvc(k - 1))) k -= 1
      }
      if (b(k) == 'l' && doubleC(k) && m() > 1) k -= 1
    }
  }
}
