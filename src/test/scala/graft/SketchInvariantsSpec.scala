package graft

/** Structural invariants of the sketch and semantic-dedup gate queries —
  * properties that must hold on ANY input, asserted on real fixture data
  * (the DuckDB oracles check exact values at sf0.01; these check the
  * math's defining guarantees).
  */
class SketchInvariantsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("Count-Min never under-counts (est >= exact for every probed word)") {
    val rows = SparkEntry.queries("agg_countmin")(spark, dir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("cm_est") >= r.getAs[Long]("exact_n"),
        s"${r.getAs[String]("word")}: CM under-counted")
      assert(r.getAs[Long]("overcount") >= 0L)
    }
  }

  test("HyperLogLog estimate lands within 15% of exact distinct") {
    val r = SparkEntry.queries("agg_hll_distinct")(spark, dir).collect().head
    assert(r.getAs[Long]("n_exact") > 0L)
    assert(r.getAs[Double]("rel_err") < 0.15,
      s"HLL rel_err ${r.getAs[Double]("rel_err")} out of the 1024-register band")
  }

  test("semantic dedup keepers precede their drops and live in the same space") {
    val drops = SparkEntry.queries("dedup_semantic")(spark, dir).collect()
    drops.foreach { r =>
      assert(r.getAs[Long]("dup_of") < r.getAs[Long]("vec_id"),
        "keeper must be the component minimum")
    }
    Caches.clearPersisted()
  }

  test("incremental batch dedup only reports new-batch docs with existing keepers") {
    // sf0.01: the sf0.001 fixture has near-dup pairs but none crossing
    // the 10% md5 split, which would make every assertion vacuous
    val rows = SparkEntry.queries("dedup_incremental_batch")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.nonEmpty, "fixture must contain cross-split near-dups")
    rows.foreach { r =>
      // the split rule: new batch = md5-fold bucket 0; partners must be
      // outside it
      def bucket(id: Long): Long = {
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
        val hex = md5.map("%02x".format(_)).mkString.take(15)
        java.lang.Long.parseLong(hex, 16) % 10
      }
      assert(bucket(r.getAs[Long]("new_doc_id")) == 0L)
      assert(bucket(r.getAs[Long]("dup_of_existing")) != 0L)
      assert(r.getAs[Long]("n_partners") >= 1L)
    }
    Caches.clearPersisted()
  }
}
