package graft

import org.apache.spark.sql.functions._

import graft.operators.{EmbeddingLSH, MinHashLSH, Multimodal, SimHash, TextAnalysis}

/** Behavioral invariants of the LLM-pipeline near-dup / analysis
  * operators (their cross-engine value parity is covered by the DuckDB
  * oracle rows; this pins the semantics).
  */
class NearDupSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (3L, "completely different words appear here today friends"),
    (4L, "short")
  ).toDF("doc_id", "text")

  test("minhash LSH: exact dup always pairs; jaccard(identical) = 1") {
    val pairs = MinHashLSH.candidatePairs(
      MinHashLSH.bands(docs, "doc_id", "text"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 2L)), s"exact dup must collide in every band: $pairs")
    assert(!pairs.exists { case (a, b) => Set(a, b).contains(3L) },
      "unrelated doc must not pair")

    val sets = docs.select(col("doc_id"),
      MinHashLSH.shingleSet(col("text")).as("s"))
    val j = sets.as("a").join(sets.as("b"),
        col("a.doc_id") === 0 && col("b.doc_id") === 2)
      .select(MinHashLSH.jaccard(col("a.s"), col("b.s"))).head().getDouble(0)
    assert(j == 1.0)
  }

  test("simhash: identical text -> identical fingerprint, hamming 0; near-dup close") {
    val fp = docs.select(col("doc_id"), SimHash.fingerprint(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(0L) == fp(2L))
    assert(fp.values.forall(f => f >= 0 && f < (1L << 32)))
    val ham01 = docs.sparkSession.range(1).select(
      SimHash.hamming(lit(fp(0L)), lit(fp(1L)))).head().getLong(0)
    val ham03 = docs.sparkSession.range(1).select(
      SimHash.hamming(lit(fp(0L)), lit(fp(3L)))).head().getLong(0)
    assert(ham01 < ham03, s"near-dup hamming $ham01 must beat unrelated $ham03")
  }

  test("embedding LSH: identical vectors share a bucket and score cosine 1") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.5f, -0.25f, 2.0f)),
      (1L, Seq(1.0f, 0.5f, -0.25f, 2.0f)),
      (2L, Seq(-1.0f, 3.0f, 0.25f, -2.0f))
    ).toDF("vec_id", "embedding")
    val pairs = EmbeddingLSH.nearDupPairs(vecs, "vec_id", "embedding",
      numBands = 3, planesPerBand = 2, dim = 4, tau = 0.9).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 0L && pairs.head.getLong(1) == 1L)
    assert(math.abs(pairs.head.getDouble(2) - 1.0) < 1e-9)
  }

  test("embedding LSH OR-banding: recall >= 0.9 for cosine >= 0.8 pairs vs brute force") {
    // synthetic corpus: 200 random unit-ish vectors, 50 of them with a
    // planted near-dup at high-but-not-identical cosine. Ground truth =
    // brute-force all-pairs cosine >= 0.8 (independent of the operator).
    val d = 32
    val rnd = new scala.util.Random(7L)
    def unit(v: Array[Float]): Seq[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      v.map(x => (x / n).toFloat).toSeq
    }
    val base = Array.fill(200)(Array.fill(d)(rnd.nextGaussian().toFloat))
    val rows = base.zipWithIndex.map { case (v, i) => (i.toLong, unit(v)) } ++
      base.take(50).zipWithIndex.map { case (v, i) =>
        // perturbation sized to land planted pairs near cos ≈ 0.82-0.92 —
        // the mid-similarity region single-band LSH loses
        (200L + i, unit(v.map(x => x + 0.55f * rnd.nextGaussian().toFloat)))
      }
    val df = rows.toSeq.toDF("vec_id", "embedding")

    def cos(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val truth = (for {
      i <- rows.indices; j <- (i + 1) until rows.length
      if cos(rows(i)._2, rows(j)._2) >= 0.8
    } yield (math.min(rows(i)._1, rows(j)._1), math.max(rows(i)._1, rows(j)._1))).toSet
    assert(truth.size >= 40, s"fixture should plant >=40 true pairs, got ${truth.size}")

    val found = EmbeddingLSH.nearDupPairs(df, "vec_id", "embedding",
      numBands = 16, planesPerBand = 8, dim = d, tau = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.count(found.contains).toDouble / truth.size
    info(f"OR-banded embedding LSH recall = $recall%.3f over ${truth.size} true pairs")
    assert(recall >= 0.9, f"recall $recall%.3f below 0.9 gate")
    assert(found.forall { case (a, b) => a < b })
  }

  test("LSH hot-bucket cap drops degenerate buckets, keeps normal pairs") {
    // 60 copies of one boilerplate doc (a degenerate bucket that would
    // emit ~1800 candidate pairs) + one genuine near-dup pair
    val degen = (0 until 60).map(i =>
      (i.toLong, "identical boilerplate text repeated across the corpus"))
    val normal = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"),
      (101L, "the quick brown fox jumps over the lazy dog today"))
    val df = (degen ++ normal).toDF("doc_id", "text")
    val bands = MinHashLSH.bands(df, "doc_id", "text")
    val capped = MinHashLSH.candidatePairs(bands, "doc_id", maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.contains((100L, 101L)), "normal near-dup pair must survive the cap")
    assert(!capped.exists { case (a, b) => a < 60L && b < 60L },
      "degenerate-bucket pairs must be dropped (exact dedup handles them)")
    // uncapped default still finds everything
    val uncapped = MinHashLSH.candidatePairs(bands, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((0L, 59L)) && uncapped.contains((100L, 101L)))
  }

  test("simhash pigeonhole banding: exact equivalence to brute-force hamming <= 3") {
    // random 32-bit fingerprints plus planted 1-3-bit-flip neighbors;
    // pigeonhole banding must be EXACT (complete + precise) vs brute force
    val rnd = new scala.util.Random(11L)
    val baseFps = Array.fill(80)(rnd.nextLong().abs % (1L << 32))
    val planted = baseFps.take(20).zipWithIndex.map { case (fp, i) =>
      var f = fp
      (0 to i % 3).foreach(_ => f = f ^ (1L << rnd.nextInt(32)))
      f
    }
    val all = (baseFps ++ planted).zipWithIndex.map { case (fp, i) => (i.toLong, fp) }
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val truth = (for {
      i <- all.indices; j <- (i + 1) until all.length
      if ham(all(i)._2, all(j)._2) <= 3
    } yield (all(i)._1, all(j)._1, ham(all(i)._2, all(j)._2).toLong)).toSet
    assert(truth.size >= 15, s"fixture should plant >=15 close pairs, got ${truth.size}")

    val df = all.toSeq.toDF("doc_id", "simhash")
    val found = SimHash.nearDupPairs(df, "doc_id", "simhash", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(found == truth,
      s"banded != brute force: missing ${truth -- found}, extra ${found -- truth}")
  }

  test("LSH routed skew cap: flooded buckets resolve via exact star pairs, nothing lost") {
    // 60 copies of one boilerplate doc: a flooded bucket that would emit
    // 1770 pairs. The routed cap must bound candidates AND still resolve
    // every flood member to its keeper (star pairs through exact dedup).
    val degen = (0 until 60).map(i =>
      (i.toLong, "identical boilerplate text repeated across the corpus"))
    val normal = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"),
      (101L, "the quick brown fox jumps over the lazy dog today"))
    val df = (degen ++ normal).toDF("doc_id", "text")
    val bands = MinHashLSH.bands(df, "doc_id", "text")
    val routed = MinHashLSH.candidatePairsRouted(df, bands, "doc_id", "text",
      maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(routed.contains((100L, 101L)), "normal near-dup pair must survive")
    // bounded: star pairs (59) + the normal pair, never the 1770 explosion
    assert(routed.size <= 70, s"candidate count not bounded: ${routed.size}")
    // nothing lost: every flood member resolves to keeper 0 through CC
    val canon = graft.operators.ConnectedComponents
      .canonicalIds(routed.toSeq.toDF("doc_a", "doc_b"), "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L until 60L).foreach(i => assert(canon(i) == 0L,
      s"flood member $i lost its keeper: ${canon.get(i)}"))

    // embedding flavor: 40 identical vectors flood their buckets
    val vecs = ((0 until 40).map(i => (i.toLong, Seq(1.0f, 0.5f, -0.25f, 2.0f))) ++
      Seq((100L, Seq(-1.0f, 3.0f, 0.25f, -2.0f)))).toDF("vec_id", "embedding")
    val epairs = graft.operators.EmbeddingLSH.candidatePairsRouted(
      vecs, "vec_id", "embedding", numBands = 3, planesPerBand = 2, dim = 4,
      maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(epairs.size <= 45, s"embedding candidates not bounded: ${epairs.size}")
    (1L until 40L).foreach(i => assert(epairs.contains((0L, i)),
      s"identical vector $i must star-pair with keeper 0"))
  }

  test("audio stats: real PCM read — rms/peak equal the square-wave amplitude") {
    val a = Multimodal.audioStatsLocal(
      Multimodal.wavBytes(16000, 2, 777, amplitude = 1234)).get
    assert(a == Multimodal.AudioStats(16000L, 2L, 777L, 777L * 1000 / 16000,
      1234L, 1234.0), s"got $a")
    // silence: zero rms/peak, duration still from the data chunk
    val s = Multimodal.audioStatsLocal(Multimodal.wavBytes(8000, 1, 100)).get
    assert(s.peak == 0L && s.rms == 0.0 && s.duration_ms == 12L)
    // non-wav and garbage drop, never throw
    assert(Multimodal.audioStatsLocal(
      Multimodal.imageBytes(10, 10, 0x0, "png")).isEmpty)
    assert(Multimodal.audioStatsLocal("junk".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.audioStatsLocal(null).isEmpty)
    // hostile chunk size must not spin or crash (same payload as decode test)
    val evil = Multimodal.wavBytes(8000, 1, 4)
    evil(16) = 0xf8.toByte; evil(17) = 0xff.toByte
    evil(18) = 0xff.toByte; evil(19) = 0xff.toByte
    assert(Multimodal.audioStatsLocal(evil).isEmpty)
  }

  test("resize guard: crafted huge-dimension header refuses the raster decode") {
    // a valid PNG signature + IHDR declaring 100000x100000: decodeLocal
    // parses it happily (header-only), but resizeLocal must refuse before
    // ImageIO allocates a 10-gigapixel raster
    val huge = Multimodal.imageBytes(4, 4, 0x0, "png")
    def be(i: Int): Array[Byte] = Array((i >> 24).toByte, (i >> 16).toByte,
      (i >> 8).toByte, i.toByte)
    System.arraycopy(be(100000), 0, huge, 16, 4)
    System.arraycopy(be(100000), 0, huge, 20, 4)
    assert(Multimodal.decodeLocal(huge).width == 100000L)
    assert(Multimodal.resizeLocal(huge, 64).isEmpty,
      "huge declared dims must be refused before the raster decode")
  }

  test("text analysis: langId picks profile language; quality in [0,1]") {
    val d = Seq(
      (0L, "the cat is a friend of the dog and it is fine"),
      (1L, "der hund ist nicht das problem und die katze"),
      (2L, "xyz qqq zzz www")
    ).toDF("doc_id", "text")
    val (pred, _) = TextAnalysis.langId(TextAnalysis.tokens(col("text")))
    val preds = d.select(col("doc_id"), pred.as("p")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds(0L) == "en" && preds(1L) == "de" && preds(2L) == "und")

    val q = d.select(TextAnalysis.qualityScore(col("text")).as("q"))
      .collect().map(_.getDouble(0))
    assert(q.forall(x => x >= 0.0 && x <= 1.0))
  }

  test("multimodal decode: real container headers parse to exact metadata") {
    // real encoder bytes with known dimensions, parsed back by the operator
    for (fmt <- Seq("png", "jpg", "gif", "bmp")) {
      val bytes = Multimodal.imageBytes(123, 57, 0x336699, fmt)
      val m = Multimodal.decodeLocal(bytes)
      val expected = if (fmt == "jpg") "jpeg" else fmt
      assert(m.format == expected, s"$fmt sniffed as ${m.format}")
      assert(m.width == 123L && m.height == 57L, s"$fmt parsed ${m.width}x${m.height}")
      assert(m.n_frames == 1L)
    }
    val wav = Multimodal.decodeLocal(Multimodal.wavBytes(16000, 2, 777))
    assert(wav == Multimodal.MediaMeta("wav", 16000L, 2L, 777L))
    // garbage and truncated payloads degrade to unknown, never throw
    assert(Multimodal.decodeLocal("not media".getBytes("UTF-8")).format == "unknown")
    assert(Multimodal.decodeLocal(Array[Byte](0x42, 0x4d)).format == "unknown")
    assert(Multimodal.decodeLocal(null).format == "unknown")
  }

  test("video stats: real MP4 box walk — stts frame count three containers deep") {
    val v = Multimodal.videoStatsLocal(
      Multimodal.mp4Bytes(640, 360, 1200, 50, 48)).get
    assert(v == Multimodal.VideoStats(640L, 360L, 1200L,
      48L * 50 * 1000 / 1200, 48L, 1L), s"got $v")
    // decodeLocal sniff chain picks mp4 up too
    val m = Multimodal.decodeLocal(Multimodal.mp4Bytes(320, 240, 600, 25, 30))
    assert(m == Multimodal.MediaMeta("mp4", 320L, 240L, 30L), s"got $m")
    // md5-derived synthesis round-trips (the oracle contract)
    val sv = Multimodal.videoStatsLocal(
      Multimodal.synthesizeVideoPayload("some document text")).get
    assert(sv.video_tracks == 1L && sv.width % 16 == 0 && sv.timescale % 600 == 0)
    // non-video / garbage / null drop, never throw
    assert(Multimodal.videoStatsLocal(
      Multimodal.imageBytes(10, 10, 0x0, "png")).isEmpty)
    assert(Multimodal.videoStatsLocal("junk".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.videoStatsLocal(null).isEmpty)
    // hostile: box size 0xFFFFFFF8 (negative int) and size 1 (64-bit
    // extended) must terminate the walk, not spin or overflow
    val evil = Multimodal.mp4Bytes(640, 360, 1200, 50, 48)
    evil(20) = 0xff.toByte; evil(21) = 0xff.toByte // clobber moov size
    evil(22) = 0xff.toByte; evil(23) = 0xf8.toByte
    assert(Multimodal.videoStatsLocal(evil).isEmpty)
    val ext = Multimodal.mp4Bytes(640, 360, 1200, 50, 48)
    ext(20) = 0; ext(21) = 0; ext(22) = 0; ext(23) = 1
    assert(Multimodal.videoStatsLocal(ext).isEmpty)
    // truncated mid-moov
    val trunc = Multimodal.mp4Bytes(640, 360, 1200, 50, 48).take(60)
    assert(Multimodal.videoStatsLocal(trunc).isEmpty)
  }

  test("multimodal decode: hostile payloads terminate and degrade to unknown") {
    // RIFF/WAVE with a chunk size of 0xFFFFFFF8 (-8 as int): a naive walk
    // advances by zero bytes and spins forever
    val evilWav = Multimodal.wavBytes(8000, 1, 4)
    evilWav(16) = 0xf8.toByte; evilWav(17) = 0xff.toByte
    evilWav(18) = 0xff.toByte; evilWav(19) = 0xff.toByte
    assert(Multimodal.decodeLocal(evilWav).format == "unknown")
    // valid 13-byte GIF header + image separator, then truncation
    val evilGif = ("GIF89a".getBytes("US-ASCII") ++
      Array[Byte](20, 0, 10, 0, 0, 0, 0, 0x2c)).padTo(14, 0.toByte)
    assert(Multimodal.decodeLocal(evilGif).format != "crash") // must not throw
    // JPEG with spec-legal fill bytes before the SOF marker still parses
    val jpg = Multimodal.imageBytes(33, 21, 0x101010, "jpg")
    val padded = jpg.take(2) ++ Array(0xff.toByte) ++ jpg.drop(2)
    val m = Multimodal.decodeLocal(padded)
    assert(m.format == "jpeg" && m.width == 33L && m.height == 21L,
      s"fill byte broke the marker walk: $m")
    // negative ids rotate formats via floorMod instead of crashing
    assert(Multimodal.decodeLocal(Multimodal.synthesizePayload(-1L, "x")).format == "wav")
  }

  test("hash kernels use SQL trim/split semantics (space-only trim, keep trailing empty)") {
    // SQL trim(lower(text)) keeps edge tabs/newlines; SQL split keeps a
    // trailing empty token (verified against Spark: "a b\t" → ["a","b",""]).
    // The kernels must match the SQL side exactly.
    assert(SimHash.fingerprintLocal("\tfoo") != SimHash.fingerprintLocal("foo"),
      "leading tab must change the token list (leading empty token)")
    assert(SimHash.fingerprintLocal("foo\n") != SimHash.fingerprintLocal("foo"),
      "trailing newline must change the token list (trailing empty token)")
    assert(SimHash.fingerprintLocal("  foo  ") == SimHash.fingerprintLocal("foo"),
      "edge spaces are trimmed")
    assert(MinHashLSH.shingleStrings("\ta b", 3).toSeq == Seq(" a b"),
      "leading empty token must survive into the shingle")
    assert(MinHashLSH.shingleStrings("a b\t", 3).toSeq == Seq("a b "),
      "trailing empty token must survive into the shingle")
    assert(MinHashLSH.shingleStrings("  a b  ", 2).toSeq == Seq("a b"))
  }

  test("connected components: transitive clusters resolve to the min id") {
    // chain 1-2-3 (1≈2, 2≈3 but no direct 1-3 edge), isolated pair 5-6,
    // and a triangle 10-11-12
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("doc_a", "doc_b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L,
      10L -> 10L, 11L -> 10L, 12L -> 10L)
    val out = graft.operators.ConnectedComponents
      .canonicalIds(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == expected, s"got $out")
    // both execution paths compute the same fixpoint: force the
    // distributed propagation (cutover at 0 pairs) and compare
    val distributed = graft.operators.ConnectedComponents
      .canonicalIds(pairs, "doc_a", "doc_b", driverMaxPairs = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(distributed == expected, s"distributed path diverged: $distributed")
  }

  test("null text/embedding rows null-propagate instead of failing the job") {
    val withNullText = Seq((0L, "real doc here"), (1L, null: String))
      .toDF("doc_id", "text")
    // minhash bands, simhash fingerprint, shingle sets, multimodal: the
    // null row drops/nulls out, the real row still processes
    assert(MinHashLSH.bands(withNullText, "doc_id", "text")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSeq == Seq(0L))
    val fps = withNullText.select(col("doc_id"),
      SimHash.fingerprint(col("text")).as("fp")).collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!fps(0L) && fps(1L), "null text -> null fingerprint, not an NPE")
    val media = Multimodal.mediaMeta(withNullText, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(media(0L) != "unknown" && media(1L) == "unknown")

    val withNullVec = Seq((0L, Seq(1.0f, 0.5f, -0.25f, 2.0f)),
      (1L, null: Seq[Float])).toDF("vec_id", "embedding")
    val pairs = EmbeddingLSH.nearDupPairs(withNullVec, "vec_id", "embedding",
      numBands = 2, planesPerBand = 2, dim = 4, tau = 0.9).collect()
    assert(pairs.isEmpty, "null embedding row must drop, not crash")
  }

  test("multimodal resize: real pixel decode, integer aspect-fit dims") {
    // 200x100 real PNG → fit 64 → 64x32 (floor division aspect math)
    val big = Multimodal.imageBytes(200, 100, 0xaabbcc, "png")
    val r = Multimodal.resizeLocal(big, 64).get
    assert(r == Multimodal.ResizedMeta("png", 200L, 100L, 64L, 32L), s"got $r")
    // small images pass through unchanged
    val small = Multimodal.imageBytes(30, 20, 0x112233, "jpg")
    val rs = Multimodal.resizeLocal(small, 64).get
    assert((rs.new_width, rs.new_height) == (30L, 20L))
    // extreme aspect never collapses to zero
    val thin = Multimodal.imageBytes(500, 2, 0x0, "png")
    val rt = Multimodal.resizeLocal(thin, 64).get
    assert(rt.new_height == 1L && rt.new_width == 64L)
    // non-images and garbage drop (None), never throw
    assert(Multimodal.resizeLocal(Multimodal.wavBytes(8000, 1, 10), 64).isEmpty)
    assert(Multimodal.resizeLocal("junk".getBytes("UTF-8"), 64).isEmpty)
  }

  test("multimodal decode: animated GIF frame count from the block walk") {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val buf = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(buf)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until 3).foreach { i =>
      val img = new java.awt.image.BufferedImage(20, 10,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); ios.close()
    val m = Multimodal.decodeLocal(buf.toByteArray)
    assert(m.format == "gif" && m.width == 20L && m.height == 10L)
    assert(m.n_frames == 3L, s"expected 3 frames, parsed ${m.n_frames}")
  }

  test("multimodal pipeline: per-doc payload decodes deterministically") {
    val out = Multimodal.mediaMeta(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // format rotates by id; ids 0 and 2 share text -> same dims, both images
    assert(out(0L)._1 == "png" && out(1L)._1 == "jpeg" && out(2L)._1 == "gif")
    assert(out(3L)._1 == "bmp" && out(4L)._1 == "wav")
    assert((out(0L)._2, out(0L)._3) == (out(2L)._2, out(2L)._3),
      "same text -> same derived dimensions")
    assert(out.values.filter(_._1 != "wav").forall { case (_, w, h, f) =>
      w >= 8 && w <= 256 && h >= 8 && h <= 256 && f == 1L })
    val again = Multimodal.mediaMeta(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out == again)
  }

  test("embedding LSH routed path returns empty on empty input (no NPE)") {
    // round-7 ADVICE: the bucket-size probe's global max over zero groups
    // is a null row — must take the fast path, not throw
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val pairs = EmbeddingLSH.candidatePairsRouted(
      empty, "vec_id", "embedding", numBands = 3, planesPerBand = 2, dim = 4)
    assert(pairs.collect().isEmpty)
  }

  test("dedup keep-best: one keeper per cluster, and it has the cluster's max quality") {
    val rows = SparkEntry.queries("dedup_keep_best")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getInt(3)))
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_._3)
    for ((keeper, members) <- byCluster) {
      assert(members.count(_._4 == 1) == 1, s"cluster $keeper: exactly one keep")
      val kept = members.find(_._4 == 1).get
      assert(kept._1 == keeper, "the keep row is the keeper itself")
      assert(members.forall(m => m._2 < kept._2 ||
        (m._2 == kept._2 && m._1 >= kept._1)),
        s"cluster $keeper: keeper must have max quality (min-id tiebreak)")
    }
  }

  test("cross-corpus dedup: planted dup flags against the corpus keeper, novel doc passes") {
    // corpus: docs 0-2 (0 and 2 identical); incoming: 10 = exact copy of
    // doc 0's text, 11 = novel, 12 = near-dup of 0 (one word changed)
    val corpus = docs.filter(col("doc_id") <= 2)
    val incoming = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "nothing in common with anything else whatsoever entirely"),
      (12L, "the quick brown fox jumps over the lazy cat")
    ).toDF("doc_id", "text")
    val out = MinHashLSH.crossCorpusDups(corpus, incoming, "doc_id", "text",
        threshold = 0.1)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2),
         if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toMap
    assert(out.keySet == Set(10L, 11L, 12L), "one row per incoming doc")
    // exact copy: matches 0, 1 (near), 2 (exact) — keeper is min id 0, J=1
    assert(out(10L)._2 == 0L && out(10L)._3 == 1.0, s"exact dup: ${out(10L)}")
    assert(out(10L)._1 == 3L)
    assert(out(11L) == ((0L, -1L, -1.0)), "novel doc must pass clean")
    // near-dup: collides and verifies above 0.1 against at least doc 1
    assert(out(12L)._1 >= 1L && out(12L)._3 >= 0.1, s"near dup: ${out(12L)}")
    // incoming docs are never paired with EACH OTHER (10 vs 12 are near
    // dups but both incoming — corpus-only matching by contract)
    assert(out(12L)._2 <= 2L)
  }
}
