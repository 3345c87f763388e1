package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted-pattern tests for the frequent-itemset / sequence miners and
  * the filtered-ANN read path.
  */
class MiningSpec extends SparkSpec {
  import spark.implicits._

  test("frequentTriples: planted baskets, canonical ordering, all_conf") {
    // baskets: {1,2,3} ×2, {1,2,4}, {5} — only (1,2,3) reaches support 2
    val b = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 1L), (11L, 2L), (11L, 3L),
      (12L, 1L), (12L, 2L), (12L, 4L),
      (13L, 5L)).toDF("o", "p")
    val out = Mining.frequentTriples(b, minsup = 2L).collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((1L, 2L, 3L, 2L)))
    // all_conf = 2 / max(sup(1)=3, sup(2)=3, sup(3)=2) = 2/3
    assert(math.abs(r.getDouble(4) - 0.666667) < 1e-9)
    graft.Caches.clearPersisted()
  }

  test("frequentSequences: gaps allowed, repeats need two occurrences") {
    // s1: a b c   s2: a c   s3: b a   s4: a a
    def seq(sid: String, ets: String*) =
      ets.zipWithIndex.map { case (e, i) => (sid, e, (i + 1).toLong) }
    val pos = (seq("s1", "a", "b", "c") ++ seq("s2", "a", "c") ++
      seq("s3", "b", "a") ++ seq("s4", "a", "a")).toDF("sid", "et", "pos")
    // minsupFrac small → minsup = ceil(4 * 0.1) = 1: everything present
    val m = Mining.frequentSequences(pos, minsupFrac = 0.1)
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(m("a") === 4)            // all four sequences
    assert(m("a>c") === 2)          // s1 (gap over b) and s2
    assert(m("b>a") === 1)          // s3 only
    assert(m("a>a") === 1)          // s4 only — repeats need 2 occurrences
    assert(m("a>b>c") === 1)        // s1
    assert(!m.contains("c>a"))      // never occurs in order
    graft.Caches.clearPersisted()
  }

  test("associationRules: planted baskets give hand-computed confidence and lift") {
    // 4 baskets: {1,2,3} ×3, {2} ×1 — pair (1,2) sup 3; triple sup 3
    val b = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 1L), (11L, 2L), (11L, 3L),
      (12L, 1L), (12L, 2L), (12L, 3L),
      (13L, 2L)).toDF("o", "p")
    val rules = Mining.associationRules(b, minsupPair = 3L, minsupTriple = 3L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // 1 → 2: conf = 3/3 = 1, lift = 1·4/sup(2)=4/4 = 1
    assert(rules(("1", 2L)) === ((3L, 1.0, 1.0)))
    // 2 → 1: conf = 3/4, lift = 0.75·4/3 = 1
    assert(rules(("2", 1L)) === ((3L, 0.75, 1.0)))
    // {1,2} → 3: conf = 3/3 = 1, lift = 4/3
    assert(rules(("1,2", 3L))._2 === 1.0)
    assert(math.abs(rules(("1,2", 3L))._3 - 1.333333) < 1e-9)
    graft.Caches.clearPersisted()
  }

  test("betweenness: path graph puts all brokerage on interior nodes") {
    // path 1—2—3—4, source 1 (depth 3): δ(2)=2, δ(3)=1, δ(4)=0
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
      .toDF("src", "dst", "w")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val got = Graph.betweennessSeeds(edges, seeds, depth = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === Map(2L -> 2.0, 3L -> 1.0))
    graft.Caches.clearPersisted()
  }

  test("betweenness: star center brokers every leaf pair, split paths halve") {
    // star: center 10, leaves 1..4; source = leaf 1. Paths 1→k (k≥2)
    // all pass 10: δ(10) = 3. Diamond check: 1—2, 1—3, 2—4, 3—4 from
    // source 1: σ(4)=2 via two equal paths → δ(2)=δ(3)=0.5
    val star = Seq((10L, 1L, 1L), (10L, 2L, 1L), (10L, 3L, 1L), (10L, 4L, 1L))
      .toDF("src", "dst", "w")
    val gotStar = Graph.betweennessSeeds(star,
        Seq(Tuple1(1L)).toDF("node"), depth = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(gotStar === Map(10L -> 3.0))
    graft.Caches.clearPersisted()
    val diamond = Seq((1L, 2L, 1L), (1L, 3L, 1L), (2L, 4L, 1L), (3L, 4L, 1L))
      .toDF("src", "dst", "w")
    val gotD = Graph.betweennessSeeds(diamond,
        Seq(Tuple1(1L)).toDF("node"), depth = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(gotD === Map(2L -> 0.5, 3L -> 0.5))
    graft.Caches.clearPersisted()
  }

  test("closeness: path graph from one end, hand-computed") {
    // path 1—2—3—4, seed 1, depth 3: d = 1,2,3 → n=3, Σd=6,
    // closeness = 3/6 = 0.5, harmonic = 1 + 1/2 + 1/3
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
      .toDF("src", "dst", "w")
    val got = Graph.closenessSeeds(edges, Seq(Tuple1(1L)).toDF("node"), depth = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got === Array((1L, 3L, 6L, 0.5, 1.833333)))
    graft.Caches.clearPersisted()
  }

  test("filtered ANN: full-probe filtered search equals brute force over the filtered set") {
    val vecs = (0L until 24L).map { i =>
      (i, Array.tabulate(8)(d => math.sin(i * 7 + d).toFloat), (i % 3).toInt)
    }.toDF("vec_id", "embedding", "label")
    val corpus = vecs.select("vec_id", "embedding")
    val q = corpus.filter(col("vec_id") < 2)
    // nprobe = nCentroids → every cell probed → the filter is the only
    // difference from exact search over the filtered corpus. The corpus
    // frame carries `label` explicitly — ivfTopK validates filter
    // references against the passed frame (r12 ADVICE)
    val filtered = Similarity.ivfTopK(vecs, q, k = 3, nCentroids = 4,
        nprobe = 4, candidateFilter = Some(col("label") === 1))
      .select("query_id", "vec_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = Similarity.bruteForceTopK(
        vecs.filter(col("label") === 1).select("vec_id", "embedding"), q, k = 3)
      .select("query_id", "vec_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // both paths exclude the self-match, so the top-3 sets coincide
    assert(filtered === brute)
    graft.Caches.clearPersisted()
  }
}
