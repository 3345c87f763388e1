package graft.ext

import graft.SparkSpec

class LinkPredictionSpec extends SparkSpec {

  test("4-cycle with a pendant: diagonals score 1.0, pendant pairs 0.5") {
    import spark.implicits._
    // cycle 1-2-3-4 plus pendant 5 on node 1
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 5L))
      .toDF("src", "dst")
    val got = Graph.linkPrediction(edges, maxCenterDeg = 64, topK = 10)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(5))))
      .toMap
    graft.Caches.clearPersisted()
    // diagonals: N(1)∩N(3) = {2,4} over union {2,4,5}∪{2,4} minus…
    // deg(1)=3 (2,4,5), deg(3)=2 → j = 2/(3+2-2) = 2/3
    assert(got((1L, 3L)) == (2L, 0.666667))
    // N(2)∩N(4) = {1,3}, deg 2 and 2 → j = 2/(2+2-2) = 1.0
    assert(got((2L, 4L)) == (2L, 1.0))
    // pendant pairs through center 1: (2,5) and (4,5) share {1}
    assert(got((2L, 5L)) == (1L, 0.5))
    assert(got((4L, 5L)) == (1L, 0.5))
    // (3,5) share no neighbor — never a candidate
    assert(!got.contains((3L, 5L)))
  }

  test("center cap excludes wedges through hubs") {
    import spark.implicits._
    // star: hub 1 connected to 2,3,4 — all candidate pairs exist only
    // through the hub, so capping it out empties the result
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val all = Graph.linkPrediction(edges, maxCenterDeg = 64, topK = 10).count()
    graft.Caches.clearPersisted()
    val capped = Graph.linkPrediction(edges, maxCenterDeg = 2, topK = 10).count()
    graft.Caches.clearPersisted()
    assert(all == 3)  // (2,3), (2,4), (3,4)
    assert(capped == 0)
  }

  test("already-adjacent pairs are excluded") {
    import spark.implicits._
    // triangle 1-2-3: every pair shares a neighbor but all are edges
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val n = Graph.linkPrediction(edges, maxCenterDeg = 64, topK = 10).count()
    graft.Caches.clearPersisted()
    assert(n == 0)
  }
}
