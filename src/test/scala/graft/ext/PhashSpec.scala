package graft.ext

import graft.SparkSpec

class PhashSpec extends SparkSpec {

  /** Test-local naive re-derivation of the 2×2 average hash straight
    * from the fixture formula — independent of the codec + Raster path
    * the engine uses.
    */
  private def naiveHash(id: Long): Long = {
    val w = MediaCodecs.ppmWidth(id); val h = MediaCodecs.ppmHeight(id)
    val bs = new Array[Long](4); val bc = new Array[Long](4)
    var ts = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val g = (0 until 3).map(c => MediaCodecs.ppmChannel(id, x, y, c)).sum
      val b = (y * 2 / h) * 2 + (x * 2 / w)
      bs(b) += g; bc(b) += 1; ts += g
    }
    (0 until 4).map(b => if (bs(b) * w * h > ts * bc(b)) 1L << b else 0L).sum
  }

  test("decoded-path hash equals the formula-path hash for 40 media ids") {
    import spark.implicits._
    val docs = (0L until 40L).map(i => (i, s"src${i % 3}"))
      .toDF("doc_id", "source")
    val got = Multimodal.averageHash(Multimodal.ppmTable(docs), grid = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    (0L until 40L).foreach { id =>
      assert(got(id) == naiveHash(id), s"media $id")
    }
  }

  /** Independent formula-path 4-window audio hash. */
  private def naiveAudioHash(id: Long): Long = {
    val n = MediaCodecs.wavSamples(id)
    val ws = new Array[Long](4); val wc = new Array[Long](4)
    var ts = 0L
    for (i <- 0 until n) {
      val a = math.abs(MediaCodecs.wavSample(id, i).toLong)
      val w = i * 4 / n
      ws(w) += a; wc(w) += 1; ts += a
    }
    (0 until 4).map(w => if (ws(w) * n > ts * wc(w)) 1L << w else 0L).sum
  }

  test("decoded-path audio hash equals the formula path for 40 media ids") {
    import spark.implicits._
    val docs = (0L until 40L).map(i => (i, s"src${i % 3}"))
      .toDF("doc_id", "source")
    val got = Multimodal.audioHash(Multimodal.wavTable(docs), windows = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    (0L until 40L).foreach { id =>
      assert(got(id) == naiveAudioHash(id), s"media $id")
    }
  }

  test("grid=1 hashes everything to 0 (a block never exceeds its own mean)") {
    import spark.implicits._
    val docs = (0L until 10L).map(i => (i, "s")).toDF("doc_id", "source")
    val hashes = Multimodal.averageHash(Multimodal.ppmTable(docs), grid = 1)
      .collect().map(_.getLong(3)).toSet
    assert(hashes == Set(0L))
  }

  /** Independent formula-path frame stats for one sampled frame. */
  private def naiveFrame(id: Long, f: Int): (Long, Long) = {
    val w = MediaCodecs.videoWidth(id); val h = MediaCodecs.videoHeight(id)
    val bs = new Array[Long](4); val bc = new Array[Long](4)
    var ts = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val g = (0 until 3).map(c => MediaCodecs.videoChannel(id, f, x, y, c)).sum
      val b = (y * 2 / h) * 2 + (x * 2 / w)
      bs(b) += g; bc(b) += 1; ts += g
    }
    val phash = (0 until 4)
      .map(b => if (bs(b) * w * h > ts * bc(b)) 1L << b else 0L).sum
    (ts, phash)
  }

  test("video frame sampling: decoded path equals the formula path, every 3rd frame") {
    import spark.implicits._
    val docs = (0L until 30L).map(i => (i, s"src${i % 3}"))
      .toDF("doc_id", "source")
    val got = Multimodal.sampleVideoFrames(Multimodal.videoTable(docs),
        every = 3, grid = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getInt(2), r.getLong(3), r.getLong(4))).toMap
    (0L until 30L).foreach { id =>
      val nf = MediaCodecs.videoFrames(id)
      val sampled = (0 until nf).filter(_ % 3 == 0)
      assert(got.keys.count(_._1 == id) == sampled.size, s"media $id frame count")
      sampled.foreach { f =>
        val (ts, ph) = naiveFrame(id, f)
        assert(got((id, f)) == ((nf, ts, ph)), s"media $id frame $f")
      }
    }
  }

  test("hammingNearDup finds planted near-identical hashes, not far ones") {
    import spark.implicits._
    val base = 0x1234_5678_9ABC_DEF0L
    val planted = Seq(
      (1L, base),                         // anchor
      (2L, base ^ (1L << 3)),             // 1 bit off  → near
      (3L, base ^ (1L << 3) ^ (1L << 40)),// 2 bits off → near
      (4L, base),                         // exact dup  → hamming 0
      (5L, base ^ 0x0F0F_0F0F_0F0F_0F0FL),// 32 bits off → far
      (6L, 0x8000_0000_0000_0001L),       // sign bit set — mask must strip
      (7L, 0x8000_0000_0000_0003L)        // 1 bit from 6 → near
    ).toDF("media_id", "phash")
    val got = Dedup.hammingNearDup(planted, "media_id", "phash",
        bits = 64, bands = 4, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 1L), (1L, 3L, 2L), (1L, 4L, 0L),
      (2L, 3L, 1L), (2L, 4L, 1L), (3L, 4L, 2L), (6L, 7L, 1L)))
  }

  test("banded pairs over real ppm media equal the brute-force all-pairs check") {
    import spark.implicits._
    val docs = (0L until 60L).map(i => (i, s"src${i % 3}"))
      .toDF("doc_id", "source")
    val hashes = Multimodal.averageHash(Multimodal.ppmTable(docs), grid = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(3))
    val expect = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d.toLong)).toSet
    val got = Dedup.hammingNearDup(
        Multimodal.averageHash(Multimodal.ppmTable(docs), grid = 8),
        "media_id", "phash", bits = 64, bands = 4, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // pigeonhole is lossless at maxHamming < bands (no bucket caps hit
    // at this fixture size), so banded == brute force exactly
    assert(got == expect)
    assert(expect.nonEmpty, "fixture should contain at least one near pair")
  }
}
