package graft.ext

import graft.SparkSpec

/** BPE merge training ([[BpeTrainer.train]]): the merge sequence on a
  * hand-computable corpus, multi-char merge chaining (a later merge
  * containing an earlier placeholder spells back correctly), and
  * determinism.
  */
class BpeTrainerSpec extends SparkSpec {

  private def train(words: Seq[String], k: Int): Seq[(Long, String, Long)] = {
    import spark.implicits._
    BpeTrainer.train(words.toDF("word"), numMerges = k)
      .orderBy("rank").as[(Long, String, Long)].collect().toSeq
  }

  test("merge sequence on a planted corpus matches hand-computed BPE") {
    // "abab" x3, "abc" x2: pairs ab=8(3*2+2), ba=3, bc=2 -> merge 1 = "ab".
    // Rewritten: "00" x3, "0c" x2 (0 = ab): pairs 00=3, 0c=2 ->
    // merge 2 = "00" -> spelled "abab". Then "1" x3, "0c" x2:
    // pairs 0c=2 -> merge 3 = "0c" -> spelled "abc".
    val words = Seq.fill(3)("abab") ++ Seq.fill(2)("abc")
    val got = train(words, 3)
    assert(got == Seq((1L, "ab", 8L), (2L, "abab", 3L), (3L, "abc", 2L)),
      got.toString)
  }

  test("tie-break: equal counts pick the lexicographically smallest pair") {
    // "xy" x2 and "ya" x2 inside "xya" x2: pairs xy=2, ya=2 -> "xy" wins
    val got = train(Seq("xya", "xya"), 1)
    assert(got.head._2 == "xy" && got.head._3 == 2L)
  }

  test("deterministic across runs") {
    val words = Seq("banana", "bandana", "cabana", "banana")
    assert(train(words, 4) == train(words, 4))
  }

  test("encodeColumn applies the whole ladder in training order; spellSymbol inverts") {
    import spark.implicits._
    // the planted corpus above: ladder = ab→'0', 00→'1', 0c→'2'
    val df = (Seq.fill(3)("abab") ++ Seq.fill(2)("abc")).toDF("word")
    val ladder = BpeTrainer.trainLadder(df, numMerges = 3)
    assert(ladder.map(m => (m.rank, m.raw, m.spelled)) ==
      Seq((1, "ab", "ab"), (2, "00", "abab"), (3, "0c", "abc")))
    val enc = df.select(
      BpeTrainer.encodeColumn(org.apache.spark.sql.functions.col("word"),
        ladder).as("e")).as[String].collect().toSeq
    // "abab" → "00" → "1"; "abc" → "0c" → "2": one symbol each
    assert(enc.sorted == Seq("1", "1", "1", "2", "2"))
    val spelled = df.select(BpeTrainer.spellSymbol(
        BpeTrainer.encodeColumn(
          org.apache.spark.sql.functions.col("word"), ladder), ladder)
      .as("s")).as[String].collect().toSeq
    assert(spelled.sorted == Seq("abab", "abab", "abab", "abc", "abc"))
    graft.Caches.clearPersisted()
  }
}
