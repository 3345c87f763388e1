package graft.ext

import graft.{SparkEntry, SparkSpec}

/** Invariant pins for the three r17 second-wave curation operators
  * (each oracle-gated end-to-end at sf0.01; these pin the algebraic
  * shape a refactor could silently break).
  */
class CurationOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("curate_prototype_prune: keeps ceil(n/2) hardest, kept ≥ cut ≥ pruned") {
    val rows = SparkEntry.queries("curate_prototype_prune")(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 8)
    rows.foreach { r =>
      val (n, nKeep) = (r.getLong(1), r.getLong(2))
      assert(nKeep == (n + 1) / 2, s"cluster ${r.get(0)}: n_keep $nKeep != ceil($n/2)")
      val kept = r.getDouble(3)
      val cut = r.getDouble(5)
      // cut is the SMALLEST kept distance, so the kept mean bounds it
      assert(kept >= cut - 1e-6, s"mean_dist_kept $kept < cut_dist $cut")
      if (!r.isNullAt(4)) {
        // every pruned distance sits below the boundary
        assert(r.getDouble(4) <= cut + 1e-6,
          s"mean_dist_pruned ${r.getDouble(4)} > cut_dist $cut")
      }
    }
  }

  test("decon_min_k_prob: bottom-20% mean sits at or below the full lm_score") {
    val mk = SparkEntry.queries("decon_min_k_prob")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(mk.nonEmpty)
    mk.foreach { case (d, (n, k, _)) =>
      assert(k == (n + 4) / 5, s"doc $d: k_lowest $k != ceil($n/5)")
    }
    val lm = SparkEntry.queries("text_lm_score")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    mk.foreach { case (d, (_, _, score)) =>
      assert(score <= lm(d) + 1e-5,
        s"doc $d: min_k_score $score above full mean ${lm(d)}")
    }
  }

  test("tok_unigram_viterbi: pieces rebuild the word and beat no valid split") {
    val rows = SparkEntry.queries("tok_unigram_viterbi")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val word = r.getString(0)
      val pieces = r.getString(3).split('|')
      assert(pieces.mkString("") == word,
        s"segmentation ${r.getString(3)} does not rebuild $word")
      assert(r.getLong(2) == pieces.length.toLong)
      assert(pieces.forall(p => p.nonEmpty && p.length <= 4))
      // log-prob of a real segmentation is strictly negative and no
      // worse than one raw char-by-char lower bound would allow
      assert(r.getDouble(4) < 0.0)
      assert(r.getLong(2) <= word.length.toLong)
    }
  }
}
