package graft

import org.apache.spark.sql.functions._

class MultimodalSpec extends GraftSpecBase {
  import spark.implicits._

  test("binary meta: byte length and hash over the payload") {
    val r = multimodal.Multimodal.m1(spark, sf)
    val docs = Tables.documents(spark, sf)
    assert(r.count() == docs.count())
    // ASCII text → byte_len equals char length
    val joined = r.join(docs, "doc_id")
      .filter(col("byte_len") =!= length(col("text")))
    assert(joined.count() == 0)
  }

  test("frame sample: bounded fan-out, stride covers the clip") {
    val docs = Tables.documents(spark, sf)
    val r = multimodal.Multimodal.frameSample(docs, maxFrames = 4)
    val perDoc = r.toDF().groupBy("doc_id").count()
      .collect().map(_.getLong(1))
    assert(perDoc.nonEmpty && perDoc.forall(n => n >= 1 && n <= 4),
      "every doc emits between 1 and maxFrames frames")
    // deterministic across runs
    val a = r.collect().toSet
    val b = multimodal.Multimodal.frameSample(docs, maxFrames = 4).collect().toSet
    assert(a == b)
  }

  test("feature extract: deterministic stub features, one row per doc") {
    val a = multimodal.Multimodal.m2(spark, sf).collect().toSeq
    val b = multimodal.Multimodal.m2(spark, sf).collect().toSeq
    assert(a == b, "stub decode must be deterministic")
    assert(a.nonEmpty)
    assert(a.forall(_.getAs[Int]("width") >= 64))
  }

  test("real BMP header decode: width/height from actual format bytes") {
    // minimal 3x2 24-bit BMP: 14-byte file header + 40-byte info header
    val buf = java.nio.ByteBuffer.allocate(54 + 24).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(78).putShort(0).putShort(0).putInt(54)
    buf.putInt(40).putInt(3).putInt(2).putShort(1).putShort(24)
    buf.putInt(0).putInt(24).putInt(2835).putInt(2835).putInt(0).putInt(0)
    val m = multimodal.Multimodal.decodeBmp(7L, buf.array())
    assert(m.isDefined && m.get.width == 3 && m.get.height == 2 && m.get.n_frames == 1)
  }

  test("real WAV header decode: sample rate/channels/duration from actual format bytes") {
    // canonical 44-byte PCM WAV header + 1 second of 8kHz mono u8 audio
    val rate = 8000
    val data = rate // 1 second at 1 byte/sample
    val buf = java.nio.ByteBuffer.allocate(44 + data).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + data).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
    buf.putInt(rate).putInt(rate).putShort(1).putShort(8)
    buf.put("data".getBytes).putInt(data)
    val m = multimodal.Multimodal.decodeWav(7L, buf.array())
    assert(m.isDefined, "canonical WAV must parse")
    assert(m.get.width == rate && m.get.height == 1 && m.get.n_frames == 2,
      s"got ${m.get}") // 1 + floor(8000/8000) seconds
  }

  test("real WAV PCM stats: exact rms/peak/duration from actual 16-bit sample data") {
    // 16-bit mono PCM square wave: 100 samples of +1000, 100 of -2000
    // → n=200, sum_sq = 100·10⁶ + 100·4·10⁶ = 5·10⁸,
    //   rms = sqrt(2.5e6) exactly, peak = 2000
    val rate = 1000
    val n = 200
    val buf = java.nio.ByteBuffer.allocate(44 + 2 * n).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + 2 * n).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
    buf.putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    buf.put("data".getBytes).putInt(2 * n)
    (0 until n).foreach(i => buf.putShort(if (i < 100) 1000 else -2000))
    val st = multimodal.Multimodal.wavPcmStats(buf.array())
    assert(st.isDefined, "16-bit PCM WAV must parse to sample stats")
    val (nSamples, durMs, rms, peak) = st.get
    assert(nSamples == 200 && durMs == 200L && peak == 2000, s"got $st")
    assert(rms == math.sqrt(2.5e6), s"rms must be exact: $rms")
    // negative full-scale is handled (no abs overflow), empty data is 0
    val silent = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    silent.put("RIFF".getBytes).putInt(36).put("WAVE".getBytes)
    silent.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
    silent.putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    silent.put("data".getBytes).putInt(0)
    assert(multimodal.Multimodal.wavPcmStats(silent.array()) == Some((0, 0L, 0.0, 0)))
    // 8-bit payloads refuse (not the 16-bit kernel's contract)
    val eight = java.nio.ByteBuffer.allocate(44 + 8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    eight.put("RIFF".getBytes).putInt(36 + 8).put("WAVE".getBytes)
    eight.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
    eight.putInt(rate).putInt(rate).putShort(1).putShort(8)
    eight.put("data".getBytes).putInt(8)
    assert(multimodal.Multimodal.wavPcmStats(eight.array()).isEmpty)
  }

  test("m7 audio stats: stub fields match the hand-computed content fold") {
    // non-WAV payloads take the m2-contract stub; every derived field
    // is an unsigned shift + power-of-two modulus of the 31·h+b fold
    import spark.implicits._
    val df = Seq((1L, "abc"), (2L, "abc")).toDF("doc_id", "text")
    val rows = multimodal.Multimodal.audioStats(df).collect().sortBy(_.getLong(0))
    var h = 1125899906842597L
    "abc".getBytes("UTF-8").foreach(b => h = 31 * h + b)
    val n = 1L + ((h >>> 13) % 65536L)
    val r = rows(0)
    assert(!r.getBoolean(1), "text payload must route to the stub")
    assert(r.getLong(2) == n && r.getLong(3) == n * 1000L / 16000L, s"got $r")
    assert(r.getDouble(4) == ((h >>> 44) % 4096L).toDouble * 8.0, s"got $r")
    assert(r.getLong(5) == (h >>> 29) % 32768L, s"got $r")
    assert(rows(0).toSeq.drop(1) == rows(1).toSeq.drop(1),
      "identical payloads must produce identical stats")
  }

  test("m8 byte entropy: hand-computed H, empty docs zero, uniform bytes max out") {
    import spark.implicits._
    val df = Seq((1L, "aabb"), (2L, ""), (3L, "abcd"), (4L, "aaaa"))
      .toDF("doc_id", "text")
    val r = multimodal.Multimodal.byteEntropy(df).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r(1L) == ((4L, 2L, 1.0)), s"two symbols at 50/50 = 1 bit: ${r(1L)}")
    assert(r(2L) == ((0L, 0L, 0.0)), s"empty payload = zero stats: ${r(2L)}")
    assert(r(3L) == ((4L, 4L, 2.0)), s"4 uniform symbols = 2 bits: ${r(3L)}")
    assert(r(4L) == ((4L, 1L, 0.0)), s"constant payload = 0 bits: ${r(4L)}")
  }

  test("real PNG decode: dimensions from actual javax.imageio encoder output") {
    // a REAL png produced by the JDK's encoder — signature, IHDR,
    // zlib-compressed IDAT and all
    val img = new java.awt.image.BufferedImage(17, 9, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(3, 4, 0xff8800)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val m = multimodal.Multimodal.decodePng(7L, bos.toByteArray)
    assert(m.isDefined && m.get.width == 17 && m.get.height == 9 && m.get.n_frames == 1,
      s"got $m")
    // dispatch must route it to the real parser, not the fake
    val d = multimodal.Multimodal.decode(7L, bos.toByteArray)
    assert(d.width == 17 && d.height == 9)
  }

  test("real JPEG decode: dimensions via SOF marker walk on actual encoder output") {
    val img = new java.awt.image.BufferedImage(33, 21, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val m = multimodal.Multimodal.decodeJpeg(7L, bos.toByteArray)
    assert(m.isDefined && m.get.width == 33 && m.get.height == 21, s"got $m")
    val d = multimodal.Multimodal.decode(7L, bos.toByteArray)
    assert(d.width == 33 && d.height == 21)
  }

  test("progressive JPEG (SOF2) parses via the same marker walk") {
    // handcrafted: SOI, APP0 stub, SOF2 frame header for 300x200
    val buf = java.nio.ByteBuffer.allocate(64)
    buf.put(0xff.toByte).put(0xd8.toByte)                       // SOI
    buf.put(0xff.toByte).put(0xe0.toByte).putShort(4).putShort(0) // APP0 len 4
    buf.put(0xff.toByte).put(0xc2.toByte).putShort(11)          // SOF2 len 11
    buf.put(8.toByte).putShort(200).putShort(300)               // precision, h, w
    buf.put(3.toByte).put(new Array[Byte](3))
    val m = multimodal.Multimodal.decodeJpeg(7L, buf.array())
    assert(m.isDefined && m.get.width == 300 && m.get.height == 200, s"got $m")
  }

  test("text payloads never sniff as media — fake decode path stays deterministic") {
    val text = "BMarley told a story about RIFFs and WAVEs in the studio today ok"
    val bytes = text.getBytes("UTF-8")
    assert(multimodal.Multimodal.decodeBmp(1L, bytes).isEmpty,
      "ASCII text has no NUL reserved bytes — BMP sniff must reject")
    assert(multimodal.Multimodal.decodeWav(1L, bytes).isEmpty)
  }

  test("m4 resize: real BMP nearest-neighbor picks the exact source pixels") {
    // 4x2 24-bit BMP, stride 12 (no padding), pixel bytes 0..23
    val buf = java.nio.ByteBuffer.allocate(54 + 24).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(78).putShort(0).putShort(0).putInt(54)
    buf.putInt(40).putInt(4).putInt(2).putShort(1).putShort(24)
    buf.putInt(0).putInt(24).putInt(2835).putInt(2835).putInt(0).putInt(0)
    (0 until 24).foreach(i => buf.put(i.toByte))
    val b = buf.array()
    val px = multimodal.Multimodal.bmpPixels(b)
    assert(px.isDefined && px.get._1 == 4 && px.get._2 == 2)
    // fit 4x2 into box 2 → 2x1; nearest-neighbor samples source row 0
    // at x = 0 and 2 → pixel bytes [0,1,2] and [6,7,8]
    val r = multimodal.Multimodal.resizeOne(7L, b, box = 2)
    assert((r.width, r.height, r.out_w, r.out_h) == ((4, 2, 2, 1)), s"got $r")
    val expected = java.util.Arrays.hashCode(Array[Byte](0, 1, 2, 6, 7, 8)).toLong
    assert(r.resize_hash == expected, s"hash ${r.resize_hash} != $expected")
    // no-upscale: a bitmap already inside the box keeps its dims and
    // resampling is identity (hash = hash of the raw pixel block)
    val same = multimodal.Multimodal.resizeOne(7L, b, box = 224)
    assert((same.out_w, same.out_h) == ((4, 2)))
    assert(same.resize_hash == java.util.Arrays.hashCode(px.get._3).toLong)
  }

  // 24bpp BMP from a per-pixel gray-level function (BGR all = lum)
  private def grayBmp(w: Int, h: Int, lum: (Int, Int) => Int): Array[Byte] = {
    val stride = (w * 3 + 3) & ~3
    val buf = java.nio.ByteBuffer.allocate(54 + stride * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + stride * h)
      .putShort(0).putShort(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    buf.putInt(0).putInt(stride * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    // bottom-up rows, as real BMPs store them
    (h - 1 to 0 by -1).foreach { y =>
      (0 until w).foreach { x =>
        val v = lum(x, y).toByte; buf.put(v).put(v).put(v)
      }
      (w * 3 until stride).foreach(_ => buf.put(0.toByte))
    }
    buf.array()
  }

  test("m5 dHash: brightness-shift invariant, gradient-reversal variant, grouped by hash") {
    val ramp = grayBmp(18, 16, (x, _) => x * 10)           // rises left→right
    val brighter = grayBmp(18, 16, (x, _) => x * 10 + 40)  // same gradient signs
    val reversed = grayBmp(18, 16, (x, _) => 170 - x * 10) // falls left→right
    def ph(b: Array[Byte]): Long = {
      val Some((w, h, px)) = multimodal.Multimodal.bmpPixels(b)
      multimodal.Multimodal.dHashBmp(w, h, px)
    }
    assert(ph(ramp) == ph(brighter),
      "uniform brightness shift must not move the dHash")
    assert(ph(ramp) != ph(reversed),
      "reversed gradient must flip comparison bits")
    assert(ph(ramp) == -1L >>> 0, s"all-rising rows set all 64 bits, got ${ph(ramp)}")
    // the grouping verdict: byte-different near-dups share a bucket,
    // keeper is the smallest doc_id
    val docs = Seq((1L, "alpha"), (2L, "alpha"), (3L, "beta"))
      .toDF("doc_id", "text") // identical text → identical stub hash
    val r = multimodal.Multimodal.phashDupes(docs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(2), x.getBoolean(3)))).toMap
    assert(r(1L) == ((2L, true)) && r(2L) == ((2L, false)) && r(3L) == ((1L, true)), s"got $r")
  }

  test("m4 entry: every output fits the box, aspect order preserved, one row per doc") {
    val docs = Tables.documents(spark, sf)
    val r = multimodal.Multimodal.m4(spark, sf).collect()
    assert(r.length == docs.count())
    assert(r.forall(x => x.getInt(3) <= 224 && x.getInt(4) <= 224))
    assert(r.forall(x => (x.getInt(1) >= x.getInt(2)) == (x.getInt(3) >= x.getInt(4))),
      "box fit must preserve which side is longer")
    assert(r.forall(x => math.max(x.getInt(3), x.getInt(4)) == 224 ||
      (x.getInt(1) == x.getInt(3) && x.getInt(2) == x.getInt(4))),
      "longest side pins to the box unless the image already fits")
  }

  test("m10 tiling: tile areas conserve the image area; edge tiles short; fan-out bounded") {
    val tiles = multimodal.Multimodal.imageTiles(Tables.documents(spark, sf))
      .collect().groupBy(_.doc_id)
    val dims = multimodal.Multimodal.m2(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getInt(2), r.getInt(3))).toMap
    assert(tiles.keySet == dims.keySet)
    tiles.foreach { case (id, ts) =>
      val (w, h) = dims(id)
      assert(ts.map(t => t.px_w.toLong * t.px_h).sum == w.toLong * h,
        s"doc $id: tile areas must conserve the $w x $h image")
      assert(ts.length == ((w + 63) / 64) * ((h + 63) / 64) && ts.length <= 289)
      assert(ts.forall(t => t.px_w >= 1 && t.px_w <= 64 && t.px_h >= 1 && t.px_h <= 64))
      // interior tiles are full; only the last column/row may be short
      assert(ts.forall(t => t.px_w == 64 || t.tile_x == ts.map(_.tile_x).max))
      assert(ts.forall(t => t.px_h == 64 || t.tile_y == ts.map(_.tile_y).max))
    }
  }

  test("m12 chunk plan: coverage to the clip end, stride spacing, overlap, n_chunks law") {
    val rows = multimodal.Multimodal.audioChunkPlan(Tables.documents(spark, sf))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val byDoc = rows.groupBy(_._1)
    byDoc.foreach { case (id, cs) =>
      val dur = cs.head._2
      val n = cs.head._3
      assert(cs.length == n, s"doc $id: ${cs.length} rows for n_chunks=$n")
      val exp = if (dur <= 1000) 1L else 1L + (dur - 1000 + 799) / 800
      assert(n == exp, s"doc $id: n_chunks $n != law $exp for dur $dur")
      val sorted = cs.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (0L until n),
        s"doc $id: chunk indices must be dense")
      assert(sorted.map(_._5).toSeq == (0L until n).map(_ * 800L),
        s"doc $id: starts must land on the stride grid")
      assert(sorted.last._6 == dur, s"doc $id: the plan must cover to the clip end")
      assert(sorted.forall(c => c._6 - c._5 <= 1000L),
        s"doc $id: no chunk may exceed the window")
      if (n > 1) {
        assert(sorted.sliding(2).forall(w => w(1)._5 < w(0)._6),
          s"doc $id: consecutive chunks must overlap (stride < window)")
        assert(sorted.last._5 < dur, s"doc $id: the tail chunk must be non-empty")
      }
    }
    assert(byDoc.values.exists(_.length > 1),
      "the corpus must exercise multi-chunk clips")
  }
}
