package graft.ops

import graft.SparkSpec

/** Unit spec for the multimodal plumbing: real schema/batch behavior around
  * the stubbed decoders.
  */
class MultimodalSpec extends SparkSpec {

  private def media(rows: (Long, Array[Byte])*) = {
    import spark.implicits._
    Multimodal.fromDocuments(
      rows.toSeq.map { case (id, b) => (id, new String(b, "ISO-8859-1")) }
        .toDF("doc_id", "text"))
      // round-trip text→bytes loses non-UTF8 magic bytes; rebuild payload
      .drop("payload")
      .join(rows.toSeq.toDF("media_id", "payload"), "media_id")
  }

  test("fromDocuments produces the canonical media schema") {
    import spark.implicits._
    val df = Multimodal.fromDocuments(Seq((1L, "hello")).toDF("doc_id", "text"))
    assert(df.schema.fieldNames.toSeq ===
      Seq("media_id", "kind", "payload", "meta"))
    // compare field names/types; literal-built structs tighten nullability
    val metaFields = df.schema("meta").dataType.asInstanceOf[
      org.apache.spark.sql.types.StructType].fields
    assert(metaFields.map(f => (f.name, f.dataType)).toSeq ===
      Multimodal.mediaMetaSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    val row = df.collect().head
    assert(row.getAs[Array[Byte]]("payload") === "hello".getBytes("UTF-8"))
  }

  test("metadata: size, digest, and magic-byte sniffing") {
    val png = Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)
    val jpeg = Array(0xff.toByte, 0xd8.toByte, 0xff.toByte)
    val wav = "RIFF1234WAVE".getBytes("UTF-8")
    val out = Multimodal.metadata(media(
      (1L, png), (2L, jpeg), (3L, wav), (4L, "plain text".getBytes)))
      .collect().map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Int]("n_bytes"), r.getAs[String]("sniffed_format")))).toMap
    assert(out(1L) === ((4, "png")))
    assert(out(2L) === ((3, "jpeg")))
    assert(out(3L) === ((12, "riff-wav")))
    assert(out(4L) === ((10, "unknown")))
  }

  test("byte-histogram stub is deterministic, normalized, and exact") {
    val f = Multimodal.ByteHistogramExtractor.extract(
      Array(0x00, 0x01, 0x10, 0xf0.toByte))
    assert(f.length === 16)
    assert(f(0) === 0.5f)  // 0x00, 0x01 both in bin 0
    assert(f(1) === 0.25f) // 0x10
    assert(f(15) === 0.25f) // 0xf0
    assert(math.abs(f.sum - 1.0f) < 1e-6)
  }

  test("extractFeatures streams per-partition and keeps ids aligned") {
    val out = Multimodal.extractFeatures(media(
      (7L, Array[Byte](0, 0, 0, 0)), (8L, Array[Byte](-1, -1))))
      .collect().map(r => r.getAs[Long]("media_id") ->
        r.getSeq[Float](r.fieldIndex("features"))).toMap
    assert(out(7L).head === 1.0f)            // all bytes in bin 0
    assert(out(8L)(15) === 1.0f)             // 0xff in bin 15
    assert(out.values.forall(_.size === 16))
  }

  test("real codec: PNG encode→ImageIO decode round-trips exact pixels") {
    val id = 42L
    val bytes = Multimodal.ImageCodec.syntheticPng(id)
    // Genuine PNG container: magic bytes present.
    assert((bytes(0) & 0xff) === 0x89 && bytes(1) === 'P'.toByte)
    val Some((w, h, px)) = Multimodal.ImageCodec.decode(bytes)
    assert(w === (8 + id % 9).toInt && h === (8 + (id / 9) % 9).toInt)
    for (y <- 0 until h; x <- 0 until w) {
      val p = px(y * w + x)
      assert(((p >> 16) & 0xff) === ((id * 31 + x * 7 + y * 13) % 256).toInt)
      assert(((p >> 8) & 0xff) === ((id * 17 + x * 11 + y * 5) % 256).toInt)
      assert((p & 0xff) === ((id * 23 + x * 3 + y * 19) % 256).toInt)
    }
  }

  test("real codec: decode returns None on non-image payloads") {
    assert(Multimodal.ImageCodec.decode("not an image".getBytes).isEmpty)
    assert(Multimodal.ImageCodec.decode(Array.empty[Byte]).isEmpty)
    assert(Multimodal.ImageCodec.decode(null).isEmpty)
  }

  test("luma extractor histograms decoded pixels; falls back on non-image") {
    val png = Multimodal.ImageCodec.syntheticPng(7L)
    val f = Multimodal.ImageLumaExtractor.extract(png)
    assert(f.length === 16)
    assert(math.abs(f.sum - 1.0f) < 1e-5)
    // Independently recompute from the formula — must be identical floats.
    val w = (8 + 7 % 9).toInt; val h = 8
    val counts = new Array[Float](16)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (7L * 31 + x * 7 + y * 13) % 256
      val g = (7L * 17 + x * 11 + y * 5) % 256
      val b = (7L * 23 + x * 3 + y * 19) % 256
      counts((((r + g + b) / 3) >> 4).toInt) += 1f
    }
    assert(f.toSeq === counts.map(_ / (w * h).toFloat).toSeq)
    // Fallback: byte histogram for unparseable payloads.
    val raw = Array[Byte](0, 0, -1, -1)
    assert(Multimodal.ImageLumaExtractor.extract(raw).toSeq ===
      Multimodal.ByteHistogramExtractor.extract(raw).toSeq)
  }

  test("decodeImageStats: exact channel sums; corrupt rows flagged not thrown") {
    import spark.implicits._
    val good = Multimodal.ImageCodec.syntheticPng(3L)
    val df = Seq((3L, good), (9L, "garbage".getBytes))
      .toDF("media_id", "payload")
    val out = Multimodal.decodeImageStats(df).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(out(3L).getAs[Boolean]("decoded"))
    val w = 11; val h = 8 // 8 + 3%9, 8 + (3/9)%9
    assert(out(3L).getAs[Int]("width_px") === w)
    assert(out(3L).getAs[Long]("n_px") === w.toLong * h)
    var rSum = 0L
    for (y <- 0 until h; x <- 0 until w) rSum += (3L * 31 + x * 7 + y * 13) % 256
    assert(out(3L).getAs[Long]("r_sum") === rSum)
    assert(!out(9L).getAs[Boolean]("decoded"))
    assert(out(9L).getAs[Long]("n_px") === 0L)
  }

  test("pngHeaderDims parses IHDR dims from real bytes without decoding") {
    import spark.implicits._
    val df = Seq(0L, 12L, 80L).map(id => (id, Multimodal.ImageCodec.syntheticPng(id)))
      .toDF("media_id", "payload")
    val out = Multimodal.pngHeaderDims(df).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    for (id <- Seq(0L, 12L, 80L))
      assert(out(id) === (((8 + id % 9).toInt, (8 + (id / 9) % 9).toInt)))
  }

  test("frame sampler: fixed windows with stride, sizes preserved") {
    val payload = (0 until 10).map(_.toByte).toArray // 10 bytes
    val out = Multimodal.sampleFrames(
      media((5L, payload)), new Multimodal.FixedSizeFrameSampler(3, 2))
      .collect().sortBy(_.getAs[Int]("frame_idx"))
    // windows: [0..2][3..5][6..8][9] → every 2nd → idx 0 (3B) and idx 1 (6..8, 3B)
    assert(out.length === 2)
    assert(out(0).getAs[Int]("frame_bytes") === 3)
    assert(out(0).getAs[Array[Byte]]("frame_payload") === Array[Byte](0, 1, 2))
    assert(out(1).getAs[Array[Byte]]("frame_payload") === Array[Byte](6, 7, 8))
  }

  test("real audio codec: WAV encode→AudioSystem decode round-trips exact samples") {
    for (id <- Seq(0L, 1L, 5L, 42L, 131L)) {
      val bytes = Multimodal.WavCodec.syntheticWav(id)
      // Genuine RIFF/WAVE container with the canonical 44-byte header.
      assert(new String(bytes.slice(0, 4), "US-ASCII") === "RIFF")
      assert(new String(bytes.slice(8, 12), "US-ASCII") === "WAVE")
      val Some((rate, nCh, bits, samples)) = Multimodal.WavCodec.decode(bytes)
      assert(rate === Multimodal.WavCodec.rateOf(id))
      assert(nCh === Multimodal.WavCodec.channelsOf(id))
      assert(bits === 16)
      val nFr = Multimodal.WavCodec.framesOf(id)
      assert(samples.length === nFr * nCh)
      for (i <- 0 until nFr; c <- 0 until nCh)
        assert(samples(i * nCh + c) === Multimodal.WavCodec.sampleOf(id, c, i))
    }
  }

  test("real audio codec: decode returns None on corrupt payloads, never throws") {
    assert(Multimodal.WavCodec.decode("not audio at all".getBytes).isEmpty)
    assert(Multimodal.WavCodec.decode(Array.empty[Byte]).isEmpty)
    assert(Multimodal.WavCodec.decode(null).isEmpty)
    // A RIFF prefix with a truncated body must not throw either.
    assert(Multimodal.WavCodec.decode("RIFF1234WAVEfmt ".getBytes).isEmpty)
  }

  test("wavHeaderInfo parses the canonical header fields without decoding") {
    import spark.implicits._
    val ids = Seq(0L, 3L, 7L, 40L)
    val df = ids.map(id => (id, Multimodal.WavCodec.syntheticWav(id)))
      .toDF("media_id", "payload")
    val out = Multimodal.wavHeaderInfo(df).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    for (id <- ids) {
      val r = out(id)
      assert(r.getAs[Int]("n_channels") === Multimodal.WavCodec.channelsOf(id))
      assert(r.getAs[Int]("sample_rate") === Multimodal.WavCodec.rateOf(id))
      assert(r.getAs[Int]("bits") === 16)
      assert(r.getAs[Long]("n_frames") === Multimodal.WavCodec.framesOf(id).toLong)
      assert(r.getAs[Long]("duration_ms") ===
        Multimodal.WavCodec.framesOf(id).toLong * 1000 /
          Multimodal.WavCodec.rateOf(id))
    }
  }

  test("decodeWavStats: exact per-channel sums; corrupt rows flagged not thrown") {
    import spark.implicits._
    val id = 13L // stereo (13 % 2 = 1 → 2 channels)
    val df = Seq((id, Multimodal.WavCodec.syntheticWav(id)),
      (99L, "garbage bytes".getBytes))
      .toDF("media_id", "payload")
    val out = Multimodal.decodeWavStats(df).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    val r = out(id)
    assert(r.getAs[Boolean]("decoded"))
    val nFr = Multimodal.WavCodec.framesOf(id)
    val s = for (c <- 0 to 1) yield
      (0 until nFr).map(i => Multimodal.WavCodec.sampleOf(id, c, i).toLong).sum
    assert(r.getAs[Long]("n_frames") === nFr.toLong)
    assert(r.getAs[Long]("ch0_sum") === s(0))
    assert(r.getAs[Long]("ch1_sum") === s(1))
    val all = for (c <- 0 to 1; i <- 0 until nFr)
      yield Multimodal.WavCodec.sampleOf(id, c, i)
    assert(r.getAs[Int]("v_min") === all.min)
    assert(r.getAs[Int]("v_max") === all.max)
    assert(!out(99L).getAs[Boolean]("decoded"))
    assert(out(99L).getAs[Long]("n_frames") === 0L)
  }

  test("wavFeatures: hand-checked zero-crossings and energy; corrupt flagged") {
    import spark.implicits._
    val id = 13L // stereo
    val df = Seq((id, Multimodal.WavCodec.syntheticWav(id)),
      (77L, "noise".getBytes)).toDF("media_id", "payload")
    val out = Multimodal.wavFeatures(df).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    val nFr = Multimodal.WavCodec.framesOf(id)
    def ch(c: Int) = (0 until nFr).map(i => Multimodal.WavCodec.sampleOf(id, c, i))
    for (c <- 0 to 1) {
      val s = ch(c)
      val zc = s.sliding(2).count(p => (p(0) < 0) != (p(1) < 0)).toLong
      val sq = s.map(v => v.toLong * v).sum
      val r = out(id)
      assert(r.getAs[Long](s"ch${c}_zero_crossings") === zc)
      assert(r.getAs[Long](s"ch${c}_energy") === sq)
    }
    assert(out(id).getAs[Boolean]("decoded"))
    assert(!out(77L).getAs[Boolean]("decoded"))
    assert(out(77L).getAs[Long]("ch0_energy") === 0L)
  }

  test("phash: hashes match the formula recomputation; corrupt flagged; " +
      "brightness shift leaves aHash unchanged") {
    import spark.implicits._
    val ids = Seq(0L, 5L, 13L, 44L)
    val df = (ids.map(id => (id, Multimodal.ImageCodec.syntheticPng(id))) :+
      (99L -> "not an image".getBytes)).toDF("media_id", "payload")
    val out = Multimodal.phash(df).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    def lumaOf(id: Long, x: Int, y: Int): Int =
      (((id * 31 + x * 7 + y * 13) % 256) + ((id * 17 + x * 11 + y * 5) % 256) +
        ((id * 23 + x * 3 + y * 19) % 256)).toInt / 3
    for (id <- ids) {
      val w = (8 + id % 9).toInt; val h = (8 + (id / 9) % 9).toInt
      val samples = for (y <- 0 until 6; x <- 0 until 10)
        yield lumaOf(id, x * w / 10, y * h / 6)
      val mean = samples.sum.toDouble / 60.0
      val ah = samples.zipWithIndex
        .collect { case (s, i) if s > mean => 1L << i }.foldLeft(0L)(_ | _)
      val dh = (for (y <- 0 until 6; x <- 0 until 10
        if lumaOf(id, (x + 1) * w / 11, y * h / 6) >
          lumaOf(id, x * w / 11, y * h / 6))
        yield 1L << (y * 10 + x)).foldLeft(0L)(_ | _)
      assert(out(id).getAs[Long]("ahash") === ah, s"ahash mismatch for $id")
      assert(out(id).getAs[Long]("dhash") === dh, s"dhash mismatch for $id")
    }
    assert(!out(99L).getAs[Boolean]("decoded"))
    // The perceptual property: add a constant brightness offset to every
    // channel of a real image — aHash (bits relative to the mean) must
    // not move. Build both variants directly through the JDK encoder.
    def flatPng(offset: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        12, 12, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 12; x <- 0 until 12) {
        val v = math.min(255, (x * 9 + y * 5) % 200 + offset)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val o = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", o)
      o.toByteArray
    }
    val pair = Seq((1L, flatPng(0)), (2L, flatPng(40)))
      .toDF("media_id", "payload")
    val hs = Multimodal.phash(pair).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("ahash")).toMap
    assert(hs(1L) === hs(2L),
      "aHash must be invariant to a uniform brightness shift")
    // …and phashPairs finds exactly that pair at Hamming 0.
    val pairs = Multimodal.phashPairs(pair).collect()
    assert(pairs.length === 1)
    assert(pairs(0).getAs[Long]("a_id") === 1L)
    assert(pairs(0).getAs[Long]("b_id") === 2L)
    assert(pairs(0).getAs[Int]("hamming") === 0)
  }

  test("phashBandAudit: per-bucket aggregates equal a brute-force " +
      "recomputation over the sampled buckets") {
    import spark.implicits._
    // 400 base images + an exact clone of each (same pixels → same aHash
    // → same band-0 bucket): every sampled bucket then holds at least
    // one Hamming-0 pair, so the pair arm of the audit is exercised, not
    // just doc membership.
    val base = (0L until 400L).map(id =>
      (id, Multimodal.ImageCodec.syntheticPng(id)))
    val clones = base.map { case (id, png) => (100000L + id, png) }
    val df = (base ++ clones).toDF("media_id", "payload")
    // Brute-force the contract from phash's output (phash itself is
    // pinned against the pixel formula in the spec above).
    val sig = Multimodal.phash(df).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("ahash")).toMap
    val sampled = sig.toSeq
      .map { case (id, ah) => (id, ah, ah & 32767L) }
      .filter { case (_, _, bv) =>
        ((bv * Multimodal.PhashAuditMult + Multimodal.PhashAuditOffset)
          >> Multimodal.PhashAuditShift) % Multimodal.PhashAuditMod == 0L }
    assert(sampled.nonEmpty, "fixture must hit at least one sampled bucket")
    val expected = sampled.groupBy(_._3).map { case (bv, members) =>
      val pairs = for {
        (a, ha, _) <- members; (b, hb, _) <- members
        if a < b && java.lang.Long.bitCount(ha ^ hb) <= 8
      } yield (a, b, java.lang.Long.bitCount(ha ^ hb))
      bv -> ((members.size.toLong, members.map(_._1).sum,
        pairs.size.toLong,
        pairs.map(_._3.toLong).sum,
        pairs.map { case (a, b, _) => (a * 31 + b * 7) % 1000000007L }.sum))
    }
    assert(expected.values.exists(_._3 > 0), "no pairs in any sampled bucket")
    val out = Multimodal.phashBandAudit(df).collect()
      .map(r => r.getAs[Long]("bv") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("id_sum"),
          r.getAs[Long]("n_pairs"), r.getAs[Long]("hamming_sum"),
          r.getAs[Long]("pair_digest")))).toMap
    assert(out === expected)
  }

  test("wavFeatures: valid 3-channel WAV is flagged decoded=false, not thrown") {
    import spark.implicits._
    // Hand-build a valid 3-channel PCM16 WAV — outside syntheticWav's 1-2
    // channel range, but a decodable file AudioSystem accepts; the fixed
    // two-channel stat arrays must not overrun on it.
    val nCh = 3; val nFr = 8; val rate = 8000
    val blockAlign = nCh * 2; val dataLen = nFr * blockAlign
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(nCh.toShort).putInt(rate)
      .putInt(rate * blockAlign).putShort(blockAlign.toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    for (_ <- 0 until nFr * nCh) buf.putShort(1234)
    // Sanity: the codec itself DOES decode it as 3-channel…
    assert(Multimodal.WavCodec.decode(buf.array()).exists(_._2 == 3))
    // …and the feature stage flags it instead of overruns.
    val df = Seq((5L, buf.array())).toDF("media_id", "payload")
    val r = Multimodal.wavFeatures(df).collect()(0)
    assert(!r.getAs[Boolean]("decoded"))
    assert(r.getAs[Long]("ch0_energy") === 0L)
  }

  test("wavSpectrum: pure sine at bin 2 dominates bin 2; corrupt flagged") {
    import spark.implicits._
    def pcmWav(samples: Seq[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000)
        .putInt(16000).putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(buf.putShort)
      buf.array()
    }
    val n = 64
    def sine(k: Int) = (0 until n).map(i =>
      math.round(20000.0 * math.sin(2.0 * math.Pi * k * i / n)).toShort)
    val df = Seq(
      (2L, pcmWav(sine(2))), (8L, pcmWav(sine(8))),
      (99L, "static".getBytes)).toDF("media_id", "payload")
    val out = Multimodal.wavSpectrum(df).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    // A pure sine at bin k puts (amplitude/2)² ≈ 0.0931 of full-scale
    // power in p_k and ~0 elsewhere → bin k dominates with share ≈ 1.
    assert(out(2L).getAs[Int]("dominant_bin") === 2)
    assert(out(2L).getAs[Double]("p2") > 0.09)
    assert(out(2L).getAs[Double]("p4") < 1e-4)
    assert(out(2L).getAs[Double]("dominant_share") > 0.99)
    assert(out(8L).getAs[Int]("dominant_bin") === 8)
    // Corrupt payload: flagged zero row, bin 0 — never a throw.
    assert(!out(99L).getAs[Boolean]("decoded"))
    assert(out(99L).getAs[Int]("dominant_bin") === 0)
    assert(out(99L).getAs[Double]("dominant_share") === 0.0)
  }

  test("wavGate: silent and clipped fixtures fail the right screens; " +
      "formula audio passes; corrupt fails everything") {
    import spark.implicits._
    def pcmWav(samples: Seq[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000)
        .putInt(16000).putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(buf.putShort)
      buf.array()
    }
    val df = Seq(
      (13L, Multimodal.WavCodec.syntheticWav(13L)), // formula: healthy
      (2L, pcmWav(Seq.fill(64)(0.toShort))),        // dead silence
      (3L, pcmWav(Seq.fill(64)(32767.toShort))),    // rail-clipped
      (4L, "junk".getBytes))
      .toDF("media_id", "payload")
    val out = Multimodal.wavGate(df).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    // Formula audio sweeps the full 16-bit range: loud, non-silent, with
    // the rare exact-rail sample under the 1% cap — passes all screens.
    assert(out(13L).getAs[Boolean]("pass"), s"formula wav must pass: ${out(13L)}")
    // Silence: share 1.0 → fails silence AND level, clip clean.
    assert(!out(2L).getAs[Boolean]("pass_silence"))
    assert(!out(2L).getAs[Boolean]("pass_level"))
    assert(out(2L).getAs[Boolean]("pass_clip"))
    assert(out(2L).getAs[Double]("silence_share") === 1.0)
    // Clipping: every sample at the rail → fails clip only.
    assert(!out(3L).getAs[Boolean]("pass_clip"))
    assert(out(3L).getAs[Boolean]("pass_level"))
    assert(out(3L).getAs[Double]("clipped_share") === 1.0)
    assert(out(3L).getAs[Int]("ch0_peak") === 32767)
    // Undecodable → decoded=false and every screen fails.
    assert(!out(4L).getAs[Boolean]("decoded"))
    assert(!out(4L).getAs[Boolean]("pass"))
  }

  test("wavHeaderInfo: zeroed header fields yield garbage, never ANSI errors") {
    import spark.implicits._
    // 44 zero bytes after a RIFF tag: channels, bits, and rate all parse
    // as 0 — the divisor guards must keep the scan alive under ANSI mode.
    val junk = new Array[Byte](44)
    "RIFF".getBytes("US-ASCII").copyToArray(junk)
    val df = Seq((1L, junk)).toDF("media_id", "payload")
    val r = Multimodal.wavHeaderInfo(df).collect()(0)
    assert(r.getAs[Int]("n_channels") === 0)
    assert(r.getAs[Long]("n_frames") === 0L)
    assert(r.getAs[Long]("duration_ms") === 0L)
  }

  test("gif codec: real animated container round-trips exact gray frames") {
    for (id <- Seq(0L, 3L, 7L, 42L, 100L)) {
      val bytes = Multimodal.GifCodec.syntheticGif(id)
      assert(new String(bytes.slice(0, 3), "US-ASCII") === "GIF")
      val Some(frames) = Multimodal.GifCodec.decode(bytes)
      assert(frames.length === Multimodal.GifCodec.framesOf(id))
      val w = Multimodal.GifCodec.widthOf(id)
      val h = Multimodal.GifCodec.heightOf(id)
      for (((fw, fh, px), f) <- frames.zipWithIndex) {
        assert(fw === w && fh === h)
        for (y <- 0 until h; x <- 0 until w) {
          val p = px(y * w + x)
          val v = Multimodal.GifCodec.grayOf(id, f, x, y)
          assert(((p >> 16) & 0xff) === v, s"id $id frame $f ($x,$y)")
          assert(((p >> 8) & 0xff) === v && (p & 0xff) === v)
        }
      }
    }
    // Corrupt payloads → None, never a throw.
    assert(Multimodal.GifCodec.decode("GIF89a then garbage".getBytes).isEmpty ||
      Multimodal.GifCodec.decode("GIF89a then garbage".getBytes).exists(_.isEmpty))
    assert(Multimodal.GifCodec.decode("not a gif".getBytes).isEmpty)
    assert(Multimodal.GifCodec.decode(null).isEmpty)
  }

  test("decodeGifFrameStats: one exact stat row per frame; corrupt flagged") {
    import spark.implicits._
    val id = 11L
    val df = Seq((id, Multimodal.GifCodec.syntheticGif(id)),
      (50L, "definitely not media".getBytes)).toDF("media_id", "payload")
    val out = Multimodal.decodeGifFrameStats(df).collect()
    val good = out.filter(_.getLong(0) == id).sortBy(_.getInt(1))
    assert(good.length === Multimodal.GifCodec.framesOf(id))
    val w = Multimodal.GifCodec.widthOf(id)
    val h = Multimodal.GifCodec.heightOf(id)
    for ((r, f) <- good.zipWithIndex) {
      val grays = for (y <- 0 until h; x <- 0 until w)
        yield Multimodal.GifCodec.grayOf(id, f, x, y)
      assert(r.getBoolean(2) && r.getInt(3) === w && r.getInt(4) === h)
      assert(r.getLong(6) === grays.map(_.toLong).sum)
      assert(r.getInt(7) === grays.min && r.getInt(8) === grays.max)
    }
    val bad = out.filter(_.getLong(0) == 50L)
    assert(bad.length === 1 && !bad.head.getBoolean(2) &&
      bad.head.getInt(1) === -1)
  }

  test("jpeg contract: real lossy round-trip keeps dims exact and means within tol") {
    import spark.implicits._
    val ids = (0L until 60L).toSeq
    val df = Multimodal.syntheticJpegMedia(ids.map(id => (id, "x")).toDF("doc_id", "text"))
    // Payloads are genuine JPEGs (SOI marker).
    val p = df.select("payload").as[Array[Byte]].head()
    assert((p(0) & 0xff) === 0xff && (p(1) & 0xff) === 0xd8)
    val out = Multimodal.jpegDecodeContract(df).collect()
    assert(out.length === ids.length)
    for (r <- out) {
      val id = r.getAs[Long]("media_id")
      assert(r.getAs[Boolean]("decoded"), s"id $id did not decode")
      assert(r.getAs[Int]("width_px") === (8 + id % 9).toInt)
      assert(r.getAs[Int]("height_px") === (8 + (id / 9) % 9).toInt)
      assert(r.getAs[Long]("n_px") ===
        (8 + id % 9) * (8 + (id / 9) % 9))
      for (ch <- Seq("r_ok", "g_ok", "b_ok"))
        assert(r.getAs[Boolean](ch), s"id $id channel $ch drifted past tol")
    }
  }

  test("jpeg contract: corrupt blob yields decoded=false row, not a throw") {
    import spark.implicits._
    val df = Seq((1L, "image", "THIS IS NOT A JPEG".getBytes))
      .toDF("media_id", "kind", "payload")
    val out = Multimodal.jpegDecodeContract(df).collect()
    assert(out.length === 1)
    assert(!out.head.getAs[Boolean]("decoded"))
  }

  test("imageGate: dims and aspect rules are exact; corrupt fails everything") {
    import spark.implicits._
    // id 1 → 9×8 (a side < 10: ok_dims false, aspect 9:8 ok);
    // id 8 → 16×8 (2·16 > 3·8: ok_aspect false);
    // id 20 → 10×10 (square, both sides at the floor: all pass).
    val df = Seq(1L, 8L, 20L)
      .map(id => (id, Multimodal.ImageCodec.syntheticPng(id))) :+
      (99L, "not an image".getBytes)
    val out = Multimodal.imageGate(df.toDF("media_id", "payload"))
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(!out(1L).getAs[Boolean]("ok_dims"))
    assert(out(1L).getAs[Boolean]("ok_aspect"))
    assert(!out(8L).getAs[Boolean]("ok_aspect"))
    assert(out(20L).getAs[Boolean]("ok_dims"))
    assert(out(20L).getAs[Boolean]("ok_aspect"))
    assert(out(20L).getAs[Boolean]("ok_exposure"))
    assert(out(20L).getAs[Boolean]("pass"))
    // Undecodable blob: every rule false, gate fails.
    assert(!out(99L).getAs[Boolean]("decoded"))
    assert(!out(99L).getAs[Boolean]("ok_dims"))
    assert(!out(99L).getAs[Boolean]("pass"))
  }

  test("gifMotionStats: hand-checked deltas; corrupt flagged not thrown") {
    import spark.implicits._
    val good = Multimodal.GifCodec.syntheticGif(3L)
    val df = Seq((3L, good), (9L, "not a gif".getBytes))
      .toDF("media_id", "payload")
    val out = Multimodal.gifMotionStats(df).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    val r3 = out(3L)
    assert(r3.getAs[Boolean]("decoded"))
    val (w, h, nf) = (11, 8, 2 + 3 % 4) // widthOf/heightOf/framesOf(3)
    assert(r3.getAs[Int]("n_frames") === nf)
    assert(r3.getAs[Long]("n_deltas") === (nf - 1).toLong * w * h)
    // Recompute the exact formula deltas.
    var exp = 0L
    for (f <- 0 until nf - 1; x <- 0 until w; y <- 0 until h)
      exp += math.abs(
        ((3L * 31 + (f + 1) * 41 + x * 7 + y * 13) % 256) -
          ((3L * 31 + f * 41 + x * 7 + y * 13) % 256))
    assert(r3.getAs[Long]("delta_sum") === exp)
    assert(!out(9L).getAs[Boolean]("decoded"))
    assert(out(9L).getAs[Long]("n_deltas") === 0L)
  }
}
