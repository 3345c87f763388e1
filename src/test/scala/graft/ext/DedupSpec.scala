package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    val base = "spark query engine runs distributed table scans with hash " +
      "joins and sort merge aggregation over columnar storage files"
    val nearDup = base.replace("columnar", "rowwise") // one word differs
    Seq(
      (1L, base),
      (2L, nearDup),
      (3L, base), // exact duplicate of 1
      (4L, "completely different text about cooking pasta with tomato sauce basil")
    ).toDF("doc_id", "text")
  }

  test("exact duplicate groups") {
    import spark.implicits._
    val g = Dedup.exactGroups(docs)
      .as[(String, Long, Long)].collect()
      .map { case (_, n, keeper) => (n, keeper) }.toSet
    assert(g.contains((2L, 1L))) // docs 1 & 3 share a fingerprint, keeper=1
    assert(g.count(_._1 == 1L) == 2) // docs 2 and 4 unique
  }

  test("minhash-LSH finds planted near-duplicates, not unrelated docs") {
    import spark.implicits._
    val pairs = Dedup.minhashPairs(docs, k = 3, numHashes = 32, bands = 16)
      .as[(Long, Long, Double, Double)].collect()
      .map(p => (p._1, p._2) -> (p._3, p._4)).toMap
    // exact dup pair (1,3): jaccard 1.0, est 1.0
    assert(pairs.contains((1L, 3L)))
    assert(pairs((1L, 3L))._2 == 1.0)
    // near dup pairs with doc 2: high exact jaccard
    assert(pairs.contains((1L, 2L)))
    assert(pairs((1L, 2L))._2 > 0.5)
    // unrelated doc 4 never appears
    assert(!pairs.keys.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("exact jaccard for explicit pairs") {
    import spark.implicits._
    val pairs = Seq((1L, 3L), (1L, 4L)).toDF("doc_a", "doc_b")
    val j = Dedup.jaccardForPairs(docs, pairs, k = 3)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(j((1L, 3L)) == 1.0)
    assert(j((1L, 4L)) == 0.0)
  }

  test("minhash estimate approximates true jaccard for identical sets") {
    import spark.implicits._
    val sig = Dedup.shingles(docs, 3)
      .select(col("doc_id"), Dedup.minhashSignature(col("shingles"), 32).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sig(1L) == sig(3L)) // identical shingle sets -> identical signature
    assert(sig(1L) != sig(4L))
    assert(sig(1L).length == 32)
  }

  test("simhash: identical docs equal, near-dups close, unrelated far") {
    import spark.implicits._
    val sh = Dedup.simhash(docs).as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(sh(1L) == sh(3L))
    assert(ham(sh(1L), sh(2L)) < ham(sh(1L), sh(4L)))
  }

  test("simhash near-dup banding finds the exact-dup pair, not unrelated docs") {
    import spark.implicits._
    val pairs = Dedup.simhashNearDup(docs, bands = 4, bits = 60, maxHamming = 3)
      .as[(Long, Long, Long)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    // docs 1 and 3 are identical -> identical fingerprints -> hamming 0,
    // and every band bucket matches
    assert(pairs((1L, 3L)) == 0L)
    // unrelated doc 4 never survives the hamming verify
    assert(!pairs.keys.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("hamming column matches bitCount") {
    import spark.implicits._
    val df = Seq((0xFFL, 0x0FL)).toDF("a", "b")
    val got = df.select(Dedup.hamming(col("a"), col("b"))).as[Int].head()
    assert(got == 4)
  }

  test("allPairs prefix filtering is lossless vs brute force, boundary inclusive") {
    import spark.implicits._
    // 30 synthetic docs with deterministic arithmetic overlap, plus a
    // planted EXACT-boundary pair: |{alpha,bravo,charlie}| shared of a
    // 5-word union → jaccard = 3/5 = 0.6, which must survive the prefix
    // filter (the ⌈τ·|d|⌉ ceil guard is what this exercises)
    val vocab = ('a' to 't').map(c => s"word$c")
    val synth = (0 until 30).map { i =>
      val words = vocab.zipWithIndex.collect {
        case (w, j) if (i * 7 + j * 3) % 5 < 2 => w
      }
      (100L + i, words.mkString(" "))
    }
    val planted = Seq(
      (1L, "alpha bravo charlie delta"),
      (2L, "alpha bravo charlie echo"),  // j(1,2) = 3/5 exactly
      (3L, "alpha bravo foxtrot golf"))  // j(1,3) = 2/6 — below τ
    val df = (planted ++ synth).toDF("doc_id", "text")

    val toks = graft.index.Indexer.flatWords(df, stem = false)
      .select("doc_id", "word").distinct()
    val got = Dedup.allPairsOnTokens(toks, threshold = 0.6)
      .as[(Long, Long, Double)].collect().toSet

    val ws = toks.groupBy("doc_id").agg(collect_set("word").as("s"))
    val brute = ws.as("a").join(ws.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        Dedup.jaccardCol(col("a.s"), col("b.s")).as("j"))
      .filter(col("j") >= 0.6)
      .select(col("doc_a"), col("doc_b"), round(col("j"), 6).as("j"))
      .as[(Long, Long, Double)].collect().toSet

    assert(got == brute)
    assert(got.contains((1L, 2L, 0.6)))
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("allPairs over shingles equals brute-force shingle jaccard (gate face)") {
    import spark.implicits._
    val got = Dedup.allPairs(docs, threshold = 0.5, k = 3)
      .as[(Long, Long, Double)].collect().toSet
    val sh = Dedup.shingles(docs, k = 3, hashed = true)
    val brute = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        Dedup.jaccardCol(col("a.shingles"), col("b.shingles")).as("j"))
      .filter(col("j") >= 0.5)
      .select(col("doc_a"), col("doc_b"), round(col("j"), 6).as("j"))
      .as[(Long, Long, Double)].collect().toSet
    assert(got == brute)
    assert(got.contains((1L, 3L, 1.0))) // the exact-duplicate pair
  }
}
