package graft.functions

import org.apache.spark.sql.functions.{col, length}
import graft.SparkSpec
import graft.ext.BpeTrainer

/** The large BPE path: vocabulary-bounded training past the legacy
  * 10-merge digit cap (≥ 256 merges on a synthetic vocabulary), the
  * single codegen [[BpeEncode]] expression agreeing with the trainer's
  * driver-side rewrite, and spell-back round-tripping the encode.
  */
class BpeEncodeSpec extends SparkSpec {

  /** 40 deterministic 20-char words over a–z with diverse pair
    * structure: enough total symbol mass (40×19 = 760 merge capacity)
    * that training sustains ≥ 256 distinct merges.
    */
  private def syntheticWords: Seq[String] =
    (0 until 40).map(i =>
      (0 until 20).map(j => ('a' + ((i * 7 + j * 5 + i * j) % 26)).toChar)
        .mkString)

  test("trainVocab on a hand corpus matches hand-computed weighted BPE") {
    import spark.implicits._
    // vocab {aaab: 2, aab: 1}: pairs aa = 2·2+1 = 5, ab = 2+1 = 3 →
    // merge 1 (aa, 5) → {Āab: 2, Āb: 1} (Ā = U+0100; leftmost
    // non-overlapping). Round 2: Āa = 2, ab = 2, Āb = 1 — tie broken
    // by codepoint order: "ab" < "Āa" → merge 2 (ab, 2) → {Āā: 2,
    // Āb: 1}. Round 3: (Āā, 2); round 4: (Āb, 1); exhausted.
    val words = (Seq.fill(2)("aaab") ++ Seq.fill(1)("aab")).toDF("word")
    val got = BpeTrainer.trainVocab(words, maxMerges = 10)
    assert(got.map(m => (m.rank, m.raw, m.n)) == Seq(
      (1, "aa", 5L), (2, "ab", 2L), (3, "Āā", 2L),
      (4, "Āb", 1L)), got.toString)
  }

  test("trains >= 256 merges with integer symbol ids on a synthetic vocabulary") {
    import spark.implicits._
    val ladder = BpeTrainer.trainVocab(syntheticWords.toDF("word"),
      maxMerges = 300)
    assert(ladder.length >= 256, s"only ${ladder.length} merges")
    // ranks are dense, counts monotone-ish sanity: every raw pair is
    // exactly two symbols and every symbol is a–z or an EARLIER merge
    ladder.foreach { m =>
      assert(m.raw.length == 2)
      m.raw.foreach { ch =>
        assert((ch >= 'a' && ch <= 'z') ||
          (ch >= 0x100 && ch < 0x100 + m.rank - 1), s"rank ${m.rank}: $ch")
      }
    }
  }

  test("codegen BpeEncode equals the driver-side replace chain and round-trips") {
    import spark.implicits._
    val words = syntheticWords
    val ladder = BpeTrainer.trainVocab(words.toDF("word"), maxMerges = 300)
    val raws = ladder.map(_.raw)
    val enc = words.toDF("word")
      .select(col("word"), BpeEncode.encode(col("word"), raws).as("e"))
      .as[(String, String)].collect().toMap
    words.foreach { w =>
      // driver-side reference: the same leftmost non-overlapping fold
      val ref = ladder.foldLeft(w)((s, m) =>
        s.replace(m.raw, BpeEncode.symbolFor(m.rank).toString))
      assert(enc(w) == ref, s"codegen/driver mismatch on $w")
      assert(BpeTrainer.spellLarge(enc(w), ladder) == w,
        s"round-trip failed on $w")
    }
  }

  test("ladder prefix encode is valid at any depth (tok_fertility_curve's take(d))") {
    import spark.implicits._
    val words = syntheticWords
    val ladder = BpeTrainer.trainVocab(words.toDF("word"), maxMerges = 300)
    for (d <- Seq(0, 1, 17, 256)) {
      val pre = ladder.take(d)
      val lens = words.toDF("word")
        .select(length(BpeEncode.encode(col("word"), pre.map(_.raw)))
          .as("l")).as[Int].collect()
      val refLens = words.map(w => pre.foldLeft(w)((s, m) =>
        s.replace(m.raw, BpeEncode.symbolFor(m.rank).toString)).length)
      assert(lens.toSeq == refLens, s"depth $d")
      // deeper ladders never lengthen the encoding
      assert(lens.sum <= words.map(_.length).sum)
    }
  }

  test("whole-text encode equals per-word encode (pairs never span the separator)") {
    import spark.implicits._
    // tok_bpe_tokenize's load-bearing claim: every merge pair is two
    // symbols from [a-z ∪ U+0100..], so encoding the space-joined text
    // in one pass can never merge across a word boundary
    val words = syntheticWords
    val ladder = BpeTrainer.trainVocab(words.toDF("word"), maxMerges = 300)
    val raws = ladder.map(_.raw)
    val text = words.mkString(" ")
    val whole = Seq(text).toDF("t")
      .select(BpeEncode.encode(col("t"), raws).as("e")).as[String].head()
    val perWord = words.map(w => ladder.foldLeft(w)((s, m) =>
      s.replace(m.raw, BpeEncode.symbolFor(m.rank).toString)))
      .mkString(" ")
    assert(whole == perWord)
  }

  test("empty ladder is the identity") {
    import spark.implicits._
    val out = Seq("abc").toDF("word")
      .select(BpeEncode.encode(col("word"), Nil).as("e"))
      .as[String].head()
    assert(out == "abc")
  }
}
