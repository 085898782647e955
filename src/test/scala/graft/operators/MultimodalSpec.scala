package graft.operators

import graft.SparkSpec
import graft.operators.Multimodal.{Codec, MediaRecord, SynthMedia}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "an image document body"),
    (1L, "an audio document body"),
    (2L, "a video document body with more bytes inside it for framing"),
    (3L, "another image")
  ).toDF("doc_id", "text")

  private def len(id: Long) =
    docs.filter($"doc_id" === id).select("text").as[String].head()
      .getBytes("UTF-8").length

  test("codec: BMP/WAV/Y4M headers decode to exact metadata; garbage falls back") {
    val bmp = Codec.decode(MediaRecord(1, "image", SynthMedia.bmp(13, 7, "x".getBytes)))
    assert(bmp.width == 13 && bmp.height == 7 && bmp.duration_ms == 0)
    val wav = Codec.decode(MediaRecord(2, "audio",
      SynthMedia.wav(sampleRate = 8000, nSamples = 4000, "y".getBytes)))
    assert(wav.sample_rate == 8000 && wav.channels == 1)
    assert(wav.duration_ms == 500) // 4000 samples at 8 kHz
    val y4m = Codec.decode(MediaRecord(3, "video",
      SynthMedia.y4m(w = 6, h = 4, fps = 25, frames = 50, "z".getBytes)))
    assert(y4m.width == 6 && y4m.height == 4)
    assert(y4m.duration_ms == 2000) // 50 frames at 25 fps
    val junk = Codec.decode(MediaRecord(4, "image", Array[Byte](1, 2, 3)))
    assert(junk.width == 0 && junk.duration_ms == 0 && junk.byte_len == 3)
    assert(junk.feature.length == 8)
  }

  test("codec: corrupt containers degrade to fallback instead of hanging or throwing") {
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    // WAV with a negative chunk size (would loop forever / walk backwards)
    val evilWav = "RIFF".getBytes ++ le32(100) ++ "WAVE".getBytes ++
      "junk".getBytes ++ le32(-8) ++ Array.fill[Byte](16)(0)
    val w = Codec.decode(MediaRecord(1, "audio", evilWav))
    assert(w.sample_rate == 0 && w.duration_ms == 0)
    // WAV truncated inside the fmt fields (byteRate read would overrun)
    val shortWav = "RIFF".getBytes ++ le32(20) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ Array.fill[Byte](7)(1)
    val s = Codec.decode(MediaRecord(2, "audio", shortWav))
    assert(s.duration_ms == 0)
    // Y4M with an int-overflowing dimension and a non-numeric width
    Seq("YUV4MPEG2 W2 H2147483646 F25:1\nFRAME\n",
        "YUV4MPEG2 W9999999999 H4 F25:1\nFRAME\n").foreach { hdr =>
      val y = Codec.decode(MediaRecord(3, "video", hdr.getBytes))
      assert(y.width == 0 && y.duration_ms == 0)
    }
  }

  test("synthesize: real container bytes + cycling media type") {
    implicit val s = spark
    val media = Multimodal.synthesize(docs, "doc_id", "text").collect()
    assert(media.map(_.media_type).toSeq.sorted ==
      Seq("audio", "image", "image", "video"))
    val img = media.find(_.doc_id == 0).get.media
    assert(img(0) == 'B'.toByte && img(1) == 'M'.toByte)
    val aud = media.find(_.doc_id == 1).get.media
    assert(new String(aud.take(4), "UTF-8") == "RIFF")
    val vid = media.find(_.doc_id == 2).get.media
    assert(new String(vid.take(9), "UTF-8") == "YUV4MPEG2")
  }

  test("decodeAll: real metadata round-trips from synthesize, one row per input") {
    implicit val s = spark
    val media = Multimodal.synthesize(docs, "doc_id", "text")
    val d1 = Multimodal.decodeAll(media, batchSize = 2).collect().sortBy(_.doc_id)
    val d2 = Multimodal.decodeAll(media, batchSize = 64).collect().sortBy(_.doc_id)
    assert(d1.length == 4)
    assert(d1.map(_.width).toSeq == d2.map(_.width).toSeq) // batch size can't change results
    val image = d1.find(_.doc_id == 0).get
    assert(image.width == 4 + len(0) % 13 && image.height == 2 + len(0) % 7)
    assert(image.duration_ms == 0)
    val audio = d1.find(_.doc_id == 1).get
    assert(audio.sample_rate == 8000 && audio.channels == 1 && audio.width == 0)
    assert(audio.duration_ms == (400 + len(1)) * 1000 / 8000)
    val video = d1.find(_.doc_id == 2).get
    assert(video.width == 4 + 2 * (len(2) % 5) && video.height == 4 + 2 * (len(2) % 3))
    assert(video.duration_ms == (1 + len(2) % 40) * 1000 / 25)
    assert(d1.forall(_.feature.length == 8))
  }

  test("resize: aspect-preserving shrink, never upscales") {
    implicit val s = spark
    val media = Multimodal.synthesize(docs, "doc_id", "text")
    val decoded = Multimodal.decodeAll(media)
    val resized = Multimodal.resize(decoded, maxSide = 8).collect()
    resized.filter(_.media_type != "audio").foreach { d =>
      assert(math.max(d.width, d.height) <= 8)
      assert(d.width >= 1 && d.height >= 1)
    }
    // audio rows (0×0) pass through untouched
    assert(resized.filter(_.media_type == "audio").forall(d => d.width == 0))
    // aspect ratio approximately preserved for the shrunk rows
    val orig = decoded.collect().map(d => d.doc_id -> d).toMap
    resized.filter(d => math.max(orig(d.doc_id).width, orig(d.doc_id).height) > 8)
      .foreach { d =>
        val o = orig(d.doc_id)
        assert(math.abs(d.width.toDouble / d.height - o.width.toDouble / o.height) < 0.5)
      }
  }

  test("decodeBmpGray: exact luma roundtrip of a hand-built BMP") {
    // 2×2 image, payload bytes cycle 0,255 → per-pixel BGR triples known
    val fill = Array[Byte](0, 0, 0, -1, -1, -1) // pixel0 black, pixel1 white
    val bytes = SynthMedia.bmp(2, 2, fill)
    val Some((w, h, gray)) = Codec.decodeBmpGray(bytes)
    assert(w == 2 && h == 2)
    // rowBytes = 8 (6 pixel bytes + 2 padding), and the fill cycles
    // across the PADDED payload: stored row 0 = fill[0..5] =
    // (black, white); stored row 1 starts at offset 8 = fill[2..7 mod 6]
    // = BGR (0,255,255), (255,0,0) → luma 2/3, 1/3. Bottom-up storage
    // makes stored row 1 the TOP row of the decoded image.
    assert(gray.toSeq == Seq(2f / 3f, 1f / 3f, 0f, 1f))
  }

  test("aHash64 is stable under tiny perturbation and differs across images") {
    val a = SynthMedia.bmp(12, 6, "some image content body".getBytes)
    val b = a.clone()
    var i = 54
    while (i < b.length) { if (i % 7 == 0) b(i) = (b(i) + 1).toByte; i += 1 }
    val other = SynthMedia.bmp(12, 6,
      "completely different pixels spelled out".getBytes)
    def hash(x: Array[Byte]): Long = {
      val Some((w, h, g)) = Codec.decodeBmpGray(x)
      Codec.aHash64(w, h, g)
    }
    assert(java.lang.Long.bitCount(hash(a) ^ hash(b)) <= 3)
    assert(java.lang.Long.bitCount(hash(a) ^ hash(other)) > 3)
  }

  test("imageAHash: only decodable images hash; imageNearDups pairs the planted twin") {
    implicit val s = spark
    val imgA = SynthMedia.bmp(10, 5, "alpha beta gamma delta".getBytes)
    val imgATwin = imgA.clone()
    var i = 54
    while (i < imgATwin.length) {
      if (i % 7 == 0) imgATwin(i) = (imgATwin(i) + 1).toByte
      i += 1
    }
    val media = Seq(
      MediaRecord(1L, "image", imgA),
      MediaRecord(2L, "image", imgATwin),
      MediaRecord(3L, "image",
        SynthMedia.bmp(10, 5, "unrelated maritime charts and tide tables".getBytes)),
      MediaRecord(4L, "audio", SynthMedia.wav(8000, 100, "x".getBytes)),
      MediaRecord(5L, "image", Array[Byte](1, 2, 3)) // corrupt: dropped
    ).toDS()
    val hashes = Multimodal.imageAHash(media)
    assert(hashes.select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    val pairs = Multimodal.imageNearDups(hashes, maxHamming = 3).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).contains((1L, 2L)))
    assert(!pairs.map(r => (r.getLong(0), r.getLong(1))).contains((1L, 3L)))
  }

  test("decodePngGray: the ImageIO path decodes a real compressed PNG " +
       "to the exact luma the encoder was fed; garbage returns None") {
    val fill = Array[Byte](0, 0, 0, -1, -1, -1) // pixel0 black, pixel1 white
    val bytes = SynthMedia.png(2, 2, fill)
    // a PNG is NOT header arithmetic: the BMP decoder must refuse it
    assert(Codec.decodeBmpGray(bytes).isEmpty)
    val Some((w, h, gray)) = Codec.decodePngGray(bytes)
    assert(w == 2 && h == 2)
    // png() writes RGB top-down cycling fill 3 bytes/pixel with no row
    // padding: pixels are black, white, black, white
    assert(gray.toSeq == Seq(0f, 1f, 0f, 1f))
    // decodeImageGray dispatches to whichever image codec matches
    // (arrays compare by reference — compare the decoded fields)
    val Some((dw, dh, dg)) = Codec.decodeImageGray(bytes)
    assert(dw == w && dh == h && dg.toSeq == gray.toSeq)
    assert(Codec.decodePngGray("not a png at all".getBytes).isEmpty)
    // truncated PNG stream: magic ok, inflate fails → None, no throw
    assert(Codec.decodePngGray(bytes.take(20)).isEmpty)
  }

  test("decode: PNG rows get real width/height metadata through the " +
       "declared-image dispatch") {
    val png = SynthMedia.png(7, 5, "png metadata body".getBytes)
    val d = Codec.decode(MediaRecord(1L, "image", png))
    assert(d.width == 7 && d.height == 5 && d.byte_len == png.length)
  }

  test("pHash64: invariant to uniform brightness shift, stable under " +
       "pixel noise, discriminative across images — where aHash's " +
       "spatial-mean bits are weaker") {
    def gray(bytes: Array[Byte]): (Int, Int, Array[Float]) =
      Codec.decodeImageGray(bytes).get
    def ph(bytes: Array[Byte]): Long = {
      val (w, h, g) = gray(bytes); Codec.pHash64(w, h, g)
    }
    val body = "the quick brown fox jumps over the lazy dog".getBytes
    val base = SynthMedia.png(16, 12, body)
    // +16 brightness on every channel: AC coefficients are invariant
    // (sum of cos over a constant is 0) → identical hash
    val bright = SynthMedia.png(16, 12,
      body.map(b => math.min(255, (b & 0xff) + 16).toByte))
    assert(ph(base) == ph(bright))
    // noise on every 7th byte: low-frequency DCT block barely moves
    val noisy = SynthMedia.png(16, 12,
      body.zipWithIndex.map { case (b, i) =>
        if (i % 7 == 0) (b + 1).toByte else b })
    assert(java.lang.Long.bitCount(ph(base) ^ ph(noisy)) <= 3)
    // a different image is far away
    val other = SynthMedia.png(16, 12,
      "completely different pixels spelled out here".getBytes)
    assert(java.lang.Long.bitCount(ph(base) ^ ph(other)) > 3)
    // the kernel serves BMP luma identically (shared image-gray path)
    val bmp = SynthMedia.bmp(16, 12, body)
    val (bw, bh, bg) = gray(bmp)
    assert(Codec.pHash64(bw, bh, bg) != 0L)
  }

  test("imagePHash + imageNearDups: planted PNG perturbations pair " +
       "with their originals through the full decode path") {
    implicit val s = spark
    val mk = (id: Long, body: String) =>
      MediaRecord(id, "image", SynthMedia.png(16, 12, body.getBytes))
    val a = mk(1L, "alpha beta gamma delta epsilon zeta")
    val aNoise = MediaRecord(101L, "image", SynthMedia.png(16, 12,
      "alpha beta gamma delta epsilon zeta".getBytes.zipWithIndex
        .map { case (b, i) => if (i % 7 == 0) (b + 1).toByte else b }))
    val b = mk(2L, "unrelated second image content entirely")
    val audio = MediaRecord(3L, "audio", SynthMedia.wav(8000, 100, "x".getBytes))
    val hashes = Multimodal.imagePHash(
      Seq(a, aNoise, b, audio).toDS())
    assert(hashes.count() == 3) // the audio row never hashes
    val pairs = Multimodal.imageNearDups(hashes, maxHamming = 3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(pairs.contains((1L, 101L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("decodeWavPcm: exact PCM16 roundtrip of a hand-built WAV") {
    // fill bytes (0x01, 0x02) -> every sample = 0x0201 = 513
    val bytes = SynthMedia.wav(8000, 10, Array[Byte](1, 2))
    val Some((rate, samples)) = Codec.decodeWavPcm(bytes)
    assert(rate == 8000)
    assert(samples.length == 10)
    assert(samples.forall(_ == 513))
    assert(Codec.decodeWavPcm(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("audioHash64: amplitude-invariant, discriminative, perturbation-stable") {
    def synth(text: String): Array[Short] = {
      val Some((_, s)) = Codec.decodeWavPcm(
        SynthMedia.wav(8000, 400 + text.length, text.getBytes))
      s
    }
    val a = synth("some spoken words about orbital mechanics and tides")
    val b = synth("a completely different recording of harbor noise")
    val ha = Codec.audioHash64(a)
    // exact halving scales every band equally: delta signs survive
    // except where bands were within rounding of equal
    val half = Codec.audioHash64(a.map(s => (s / 2).toShort))
    assert(java.lang.Long.bitCount(ha ^ half) <= 4)
    assert(java.lang.Long.bitCount(ha ^ Codec.audioHash64(b)) > 10)
  }

  test("audioFingerprint + fingerprintNearDups pair a perturbed twin") {
    implicit val s = spark
    val base = SynthMedia.wav(8000, 500, "alpha beta gamma delta tides".getBytes)
    val twin = base.clone()
    var i = 44
    while (i < twin.length) { if (i % 13 == 0) twin(i) = (twin(i) + 1).toByte; i += 1 }
    val media = Seq(
      MediaRecord(1L, "audio", base),
      MediaRecord(2L, "audio", twin),
      MediaRecord(3L, "audio",
        SynthMedia.wav(8000, 500, "unrelated maritime charts entirely".getBytes)),
      MediaRecord(4L, "image", SynthMedia.bmp(4, 4, "x".getBytes))
    ).toDS()
    val hashes = Multimodal.audioFingerprint(media)
    assert(hashes.select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    val got = Multimodal.fingerprintNearDups(hashes, maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)))
    assert(!got.contains((1L, 3L)))
  }

  test("decodeY4mLuma: exact per-frame luma roundtrip; clipping is a " +
       "bit-exact frame subset; malformed streams degrade") {
    val fill = "frame content bytes for the luma roundtrip".getBytes
    val full = SynthMedia.y4mVaried(6, 4, 25, 0 until 5, fill)
    val Some((w, h, frames)) = Codec.decodeY4mLuma(full)
    assert(w == 6 && h == 4 && frames.size == 5)
    // frame 2's luma pixel (y,x) = fill((2*31 + y*6+x) % len) / 255
    val expected = (fill((2 * 31 + 7) % fill.length) & 0xff) / 255f
    assert(frames(2)(7) == expected)
    // frames differ across indices (y4mVaried keys content by index)
    assert(frames(0).toSeq != frames(1).toSeq)
    // the clipped stream decodes to EXACTLY frames 2..4 of the full one
    val Some((_, _, clipped)) = Codec.decodeY4mLuma(
      SynthMedia.y4mVaried(6, 4, 25, 2 until 5, fill))
    assert(clipped.size == 3)
    assert(clipped.zipWithIndex.forall { case (f, i) =>
      f.toSeq == frames(i + 2).toSeq })
    // luma shift moves every luma byte by exactly +16/255
    val Some((_, _, shifted)) = Codec.decodeY4mLuma(
      SynthMedia.y4mVaried(6, 4, 25, 0 until 5, fill, lumaShift = 16))
    assert(shifted(0).zip(frames(0)).forall { case (s, o) =>
      math.abs((s - o) - 16f / 255f) < 1e-6 })
    // degrade contract: truncated frame stream keeps whole frames only;
    // non-420 chroma and garbage return None
    val truncated = full.take(full.length - 3)
    assert(Codec.decodeY4mLuma(truncated).exists(_._3.size == 4))
    val c444 = new String(full.takeWhile(_ != '\n'), "US-ASCII")
      .replace("C420", "C444").getBytes ++ full.dropWhile(_ != '\n')
    assert(Codec.decodeY4mLuma(c444).isEmpty)
    assert(Codec.decodeY4mLuma("not a video".getBytes).isEmpty)
  }

  test("videoFrameHashes: one row per decoded frame; uniform brightness " +
       "shift leaves every frame hash within Hamming 3") {
    implicit val s = spark
    val fill = "a video whose frames vary by absolute index".getBytes
    val media = Seq(
      MediaRecord(1L, "video", SynthMedia.y4mVaried(16, 12, 25, 0 until 6, fill)),
      MediaRecord(2L, "video", SynthMedia.y4mVaried(16, 12, 25, 0 until 6, fill, lumaShift = 16)),
      MediaRecord(3L, "image", SynthMedia.bmp(4, 4, "x".getBytes)) // ignored
    ).toDS()
    val fh = Multimodal.videoFrameHashes(media)
      .as[(Long, Int, Long)].collect()
    assert(fh.count(_._1 == 1L) == 6 && fh.count(_._1 == 2L) == 6)
    assert(!fh.exists(_._1 == 3L))
    val byIdx = fh.groupBy(r => (r._1, r._2)).view.mapValues(_.head._3)
    (0 until 6).foreach { i =>
      val d = java.lang.Long.bitCount(byIdx((1L, i)) ^ byIdx((2L, i)))
      assert(d <= 3, s"frame $i moved $d bits under uniform brightness")
    }
    // distinct frames hash differently within a video
    assert(fh.filter(_._1 == 1L).map(_._3).distinct.length > 1)
  }

  test("videoNearDups: planted clip + brightness copies pair with the " +
       "original; unrelated videos do not") {
    implicit val s = spark
    val a = "first corpus document with plenty of text to cycle".getBytes
    val b = "a completely different second corpus document body".getBytes
    val media = Seq(
      MediaRecord(1L, "video", SynthMedia.y4mVaried(16, 12, 25, 0 until 6, a)),
      MediaRecord(2L, "video", SynthMedia.y4mVaried(16, 12, 25, 2 until 6, a)), // clip
      MediaRecord(3L, "video", SynthMedia.y4mVaried(16, 12, 25, 0 until 6, a, lumaShift = 16)),
      MediaRecord(4L, "video", SynthMedia.y4mVaried(16, 12, 25, 0 until 6, b))
    ).toDS()
    val fh = Multimodal.videoFrameHashes(media)
    val pairs = Multimodal.videoNearDups(fh, maxHamming = 3, minMatchFrac = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4))).toList
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((1L, 2L)), s"clip copy not recovered: $pairs")
    assert(keys.contains((1L, 3L)), s"brightness copy not recovered: $pairs")
    assert(!keys.exists(p => p._1 == 4L || p._2 == 4L),
      s"unrelated video paired: $pairs")
    // the clip direction is exact containment: match_frac 1.0
    assert(pairs.find(p => (p._1, p._2) == ((1L, 2L))).get._3 == 1.0)
  }

  test("sampleFrames: video rows explode into byte-window frames") {
    implicit val s = spark
    val media = Multimodal.synthesize(docs, "doc_id", "text")
    val frames = Multimodal.sampleFrames(media, frameBytes = 8, stride = 2)
    val rows = frames.select("doc_id", "frame_idx").as[(Long, Int)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._1 == 2L)) // only the video doc
    assert(rows.map(_._2).toSeq == rows.map(_._2).toSeq.sorted)
  }
}
