package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Dedup.substringRuns]] — the Lee et al. (ACL 2022)
  * exact-substring dedup re-expressed as positioned k-gram postings +
  * the gaps-and-islands diagonal grouping.
  */
class SubstringRunsSpec extends SparkSpec {
  import spark.implicits._

  private val common = ("alpha bravo charlie delta echo foxtrot golf " +
    "hotel india juliet kilo lima mike november oscar") // 15 tokens

  test("finds the maximal shared span with exact boundaries") {
    val docs = Seq(
      (1L, s"zebra yak xray $common walrus"),
      (2L, s"quokka $common"),
      (3L, "papa romeo sierra tango uniform victor whiskey none here")
    ).toDF("doc_id", "text")
    val runs = Dedup.substringRuns(docs).collect()
    assert(runs.length == 1)
    val r = runs.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    // doc 1: 3 lead-in tokens → span starts at position 3 (0-based);
    // doc 2: 1 lead-in token → position 1; maximal length = all 15
    assert(r.getInt(2) == 3 && r.getInt(3) == 1)
    assert(r.getLong(4) == 15L)
  }

  test("spans >= k but below minRunTokens are not reported") {
    val ten = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val docs = Seq(
      (1L, s"zebra $ten"),
      (2L, s"quokka $ten yak")
    ).toDF("doc_id", "text")
    // 10-token span: 3 matching 8-grams → run_tokens = 10 < 12
    assert(Dedup.substringRuns(docs).count() == 0)
    // with the threshold at k the same span IS a run of exactly 10
    val loose = Dedup.substringRuns(docs, minRunTokens = 8).collect()
    assert(loose.length == 1 && loose.head.getLong(4) == 10L)
  }

  test("within-document repeats alone never produce a run") {
    val docs = Seq(
      (1L, s"$common $common"),
      (2L, "papa romeo sierra tango uniform victor whiskey none here")
    ).toDF("doc_id", "text")
    assert(Dedup.substringRuns(docs).count() == 0)
  }
}
