package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns with typed metadata, processed in
  * partition-sized batches.
  *
  * Decode is REAL for every format whose dimensions live in a plain
  * header outside the compressed stream — BMP, WAV, PNG (IHDR), and
  * JPEG (SOF marker walk) parse with pure byte arithmetic
  * ([[Multimodal.decodeBmp]]/[[decodeWav]]/[[decodePng]]/
  * [[decodeJpeg]], spec-covered on real encoder output) — and a
  * deterministic content-hash fake stands in only where a full codec
  * would be required (no image/audio codec libs in this environment). Everything around the decode — the binary
  * schema, magic-sniff dispatch, partition-batched execution, typed
  * output — is the real production plumbing: swap `fakeDecode` for a
  * codec call and nothing else changes.
  */
object Multimodal {

  /** m1: binary payload + typed metadata, all codegen'd built-ins:
    * byte length, leading-bytes magic (format sniffing), content
    * hash. Zero shuffle.
    */
  def binaryMeta(docs: DataFrame): DataFrame =
    docs
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .select(
        col("doc_id"),
        octet_length(col("payload")).cast("long").as("byte_len"),
        hex(substring(col("payload"), 1, 2)).as("magic_hex"),
        md5(col("payload")).as("content_md5"))

  final case class MediaFeatures(doc_id: Long, byte_len: Int, width: Int,
                                 height: Int, n_frames: Int, feat_norm: Double)

  /** m2: batched decode → feature-extract over a binary column via
    * mapPartitions — the Scala-side analogue of `mapInPandas`: one
    * iterator per partition so a real codec could amortize model/
    * codec initialization across the batch. Decode = real header
    * parse for BMP/WAV, deterministic fake otherwise (see [[decode]]).
    */
  def featureExtract(docs: DataFrame): Dataset[MediaFeatures] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val binary = docs
      .withColumn("payload", encode(col("text"), "UTF-8"))
      // null payload (failed fetch / null source text) has nothing to
      // decode: skip the row, never hand the kernel a null array
      .filter(col("payload").isNotNull)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
    binary.mapPartitions { batch =>
      // per-partition init happens HERE (codec/model handle)
      batch.map { case (id, bytes) => decode(id, bytes) }
    }
  }

  /** Decode dispatch: REAL header parsing for uncompressed containers
    * that need no codec library (BMP images, WAV audio — pure byte
    * arithmetic), deterministic fake for everything else (compressed
    * codecs aren't in this environment). A production deployment
    * swaps `fakeDecode` for the codec call; the dispatch, batching,
    * and schema do not change.
    */
  private[graft] def decode(id: Long, bytes: Array[Byte]): MediaFeatures =
    decodeBmp(id, bytes).orElse(decodeWav(id, bytes))
      .orElse(decodePng(id, bytes)).orElse(decodeJpeg(id, bytes))
      .getOrElse(fakeDecode(id, bytes))

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  /** PNG: 8-byte signature then the IHDR chunk, whose width/height sit
    * big-endian at fixed offsets 16/20 (IHDR is required to be first).
    * Pure byte arithmetic — the dimensions live outside the
    * zlib-compressed pixel stream, so no codec is needed.
    */
  private[graft] def decodePng(id: Long, b: Array[Byte]): Option[MediaFeatures] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    if (b.length < 24 || !sig.indices.forall(i => b(i) == sig(i))) return None
    // bytes 12-15 must spell IHDR
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return None
    val w = be32(b, 16)
    val h = be32(b, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return None
    Some(MediaFeatures(id, b.length, w.toInt, h.toInt, 1, 0.0))
  }

  /** JPEG: SOI marker then a marker walk to the first SOF0/1/2 frame
    * header (baseline, extended-sequential, progressive), whose
    * payload carries height/width big-endian after the precision
    * byte. The walk is bounded by segment lengths — entropy-coded
    * data is never touched, so again no codec.
    */
  private[graft] def decodeJpeg(id: Long, b: Array[Byte]): Option[MediaFeatures] = {
    if (b.length < 4 || b(0) != 0xff.toByte || b(1) != 0xd8.toByte) return None
    var off = 2
    while (off + 4 <= b.length) {
      if (b(off) != 0xff.toByte) return None // desynced: not a marker
      val marker = b(off + 1) & 0xff
      if (marker == 0xff) { off += 1 } // fill byte
      else if (marker == 0xd9 || marker == 0xda) {
        // EOI / SOS: both are terminators for the dimension walk. EOI
        // has no length field (routing it through the generic branch
        // would read trailing-pad bytes as a segment length and
        // desync); SOF always precedes SOS in a decodable JPEG, so
        // reaching either without a SOF means no dimensions.
        return None
      }
      else if (marker == 0xd8 || marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
        off += 2 // standalone marker, no length field
      } else {
        val segLen = be16(b, off + 2)
        if (segLen < 2) return None
        if ((marker == 0xc0 || marker == 0xc1 || marker == 0xc2) && off + 9 <= b.length) {
          val h = be16(b, off + 5)
          val w = be16(b, off + 7)
          if (w <= 0 || h <= 0) return None
          return Some(MediaFeatures(id, b.length, w, h, 1, 0.0))
        }
        off += 2 + segLen
      }
    }
    None
  }

  /** BMP: 'BM' magic + BITMAPINFOHEADER width/height (little-endian
    * at offsets 18/22). Single "frame". Real pixels, no codec needed.
    */
  private[graft] def decodeBmp(id: Long, b: Array[Byte]): Option[MediaFeatures] = {
    if (b.length < 26 || b(0) != 'B'.toByte || b(1) != 'M'.toByte) return None
    // reserved bytes 6-9 are zero in every real BMP; text payloads
    // (no NUL in printable encodings) can never satisfy this, so the
    // sniff cannot misfire on a text corpus
    if (b(6) != 0 || b(7) != 0 || b(8) != 0 || b(9) != 0) return None
    val w = u32(b, 18).toInt
    val h = math.abs(u32(b, 22).toInt) // negative height = top-down rows
    if (w <= 0 || h == 0) return None
    Some(MediaFeatures(id, b.length, w, h, 1, 0.0))
  }

  /** WAV: RIFF/WAVE magic + fmt chunk. width := sample rate, height
    * := channels, frames := whole seconds of audio (duration proxy
    * from byte rate) — typed metadata a training pipeline filters on.
    */
  private[graft] def decodeWav(id: Long, b: Array[Byte]): Option[MediaFeatures] = {
    if (b.length < 44) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    // walk chunks to the fmt header (usually at 12, but not always)
    var off = 12
    while (off + 8 <= b.length) {
      val size = u32(b, off + 4).toInt
      if (b(off) == 'f' && b(off + 1) == 'm' && b(off + 2) == 't' && off + 8 + 16 <= b.length) {
        val channels = u16(b, off + 10)
        val sampleRate = u32(b, off + 12).toInt
        val byteRate = u32(b, off + 16)
        if (channels <= 0 || sampleRate <= 0 || byteRate <= 0) return None
        val seconds = ((b.length - 44).toLong max 0L) / byteRate
        return Some(MediaFeatures(id, b.length, sampleRate, channels,
          1 + seconds.toInt, 0.0))
      }
      off += 8 + size + (size & 1)
    }
    None
  }

  /** Real PCM sample statistics for 16-bit LE WAV payloads — the
    * audio leg's analogue of the BMP pixel kernel (bmpPixels /
    * dHashBmp): past the header into actual sample data. Walks the
    * chunk list to `fmt ` and `data`, then folds the int16 samples
    * into (n_samples, duration_ms, rms, peak) — the loudness gate a
    * speech-data curation pipeline runs before transcription. The
    * sum of squares accumulates in a Long (int16² ≤ 2³⁰, exact for
    * any payload under ~2³³ samples), so rms is deterministic: one
    * double op at the end, no fp summation-order drift. None for
    * non-WAV, non-PCM, or non-16-bit payloads (codec formats route
    * to the documented stub).
    */
  def wavPcmStats(b: Array[Byte]): Option[(Int, Long, Double, Int)] = {
    if (b.length < 44) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var off = 12
    var sampleRate = 0; var channels = 0; var bits = 0; var fmtCode = 0
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= b.length && (sampleRate == 0 || dataOff < 0)) {
      val size = u32(b, off + 4).toInt
      if (b(off) == 'f' && b(off + 1) == 'm' && b(off + 2) == 't' && off + 8 + 16 <= b.length) {
        fmtCode = u16(b, off + 8)
        channels = u16(b, off + 10)
        sampleRate = u32(b, off + 12).toInt
        bits = u16(b, off + 22)
      } else if (b(off) == 'd' && b(off + 1) == 'a' && b(off + 2) == 't' && b(off + 3) == 'a') {
        dataOff = off + 8
        dataLen = math.min(size, b.length - dataOff)
      }
      off += 8 + size + (size & 1)
    }
    if (fmtCode != 1 || bits != 16 || channels <= 0 || sampleRate <= 0 || dataOff < 0)
      return None
    val n = dataLen / 2
    var i = 0; var sumSq = 0L; var peak = 0
    while (i < n) {
      val s = ((b(dataOff + 2 * i + 1) << 8) | (b(dataOff + 2 * i) & 0xff)).toShort.toInt
      sumSq += s.toLong * s
      if (math.abs(s) > peak) peak = math.abs(s)
      i += 1
    }
    val frames = n / channels
    val durationMs = frames.toLong * 1000L / sampleRate
    val rms = if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n)
    Some((n, durationMs, rms, peak))
  }

  /** Deterministic stand-in for codec-requiring formats.
    *
    * ORACLE-PARITY PRECONDITION: the DuckDB oracles replay this fold
    * per CHARACTER (`unicode(c)`), while the kernel folds per BYTE —
    * the two agree exactly when the payload is ASCII (one byte = one
    * codepoint = one non-negative value), which the synthetic corpus
    * guarantees. Real binary/multibyte payloads keep a well-defined
    * unsigned-byte fold here (masked below) but are outside the
    * oracle's replay contract.
    */
  private def fakeDecode(id: Long, bytes: Array[Byte]): MediaFeatures = {
    var h = 1125899906842597L // FNV-ish rolling hash over content
    var i = 0
    while (i < bytes.length) { h = 31 * h + (bytes(i) & 0xff); i += 1 }
    val w = 64 + math.floorMod(h, 1024).toInt
    val ht = 64 + math.floorMod(h >>> 17, 1024).toInt
    val frames = 1 + math.floorMod(h >>> 33, 16).toInt
    MediaFeatures(id, bytes.length, w, ht, frames,
      math.abs((h % 1000000L).toDouble) / 1000000.0)
  }

  final case class FrameFeatures(doc_id: Long, frame_idx: Int, ts_ms: Long,
                                 frame_hash: Long)

  /** m3: frame sampling — one binary "video" row explodes into at
    * most `maxFrames` evenly-strided frame rows, decoded per
    * partition. The fan-out is bounded by construction (stride =
    * ceil(n/maxFrames)), so downstream row counts stay O(docs ×
    * maxFrames) no matter how long the media runs — the property that
    * keeps a 100 TB video corpus joinable. STUB decode as in m2.
    */
  def frameSample(docs: DataFrame, maxFrames: Int = 4): Dataset[FrameFeatures] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val binary = docs
      .withColumn("payload", encode(col("text"), "UTF-8"))
      // null payload (failed fetch / null source text) has nothing to
      // decode: skip the row, never hand the kernel a null array
      .filter(col("payload").isNotNull)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
    binary.mapPartitions { batch =>
      batch.flatMap { case (id, bytes) =>
        val m = decode(id, bytes)
        val stride = math.max(1, (m.n_frames + maxFrames - 1) / maxFrames)
        (0 until m.n_frames by stride).iterator.zipWithIndex.map {
          case (frame, idx) =>
            // 33 ms/frame stands in for the container timestamp
            FrameFeatures(id, idx, frame * 33L,
              java.util.Arrays.hashCode(bytes).toLong * 31 + frame)
        }
      }
    }
  }

  /** m9: scene-change segmentation over the sampled frame stream —
    * the shot-boundary pass a video curation pipeline runs before
    * per-scene captioning/embedding (scene count and density are
    * also cheap quality signals: a 1-scene hour is a static slide, a
    * 100-scene minute is strobing). A cut is declared when
    * consecutive sampled frames' perceptual hashes differ in more
    * than `bitThreshold` bits (here the m3 stub hashes; with a real
    * codec the same Hamming rule runs over real dHashes — m5's
    * kernel). First frame always opens a scene.
    *
    * Scale shape: frames are bounded (≤ maxFrames per doc, m3's
    * stride contract), the lag window and the per-doc agg ride ONE
    * doc-key shuffle, and the Hamming test is integer bit_count in
    * codegen — no joins, no fan-out beyond m3's own.
    */
  def sceneChange(docs: DataFrame, maxFrames: Int = 4,
                  bitThreshold: Int = 3): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    frameSample(docs, maxFrames).toDF()
      .withColumn("__prev", lag(col("frame_hash"), 1).over(w))
      .withColumn("__cut",
        when(col("__prev").isNull, 1L)
          .when(expr(s"bit_count(frame_hash ^ __prev) > $bitThreshold"), 1L)
          .otherwise(0L))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"), sum(col("__cut")).as("n_scenes"))
  }

  /** Verified entry (m9). Sort is oracle-determinism only. */
  def m9(spark: SparkSession, dir: String): DataFrame =
    sceneChange(Tables.documents(spark, dir)).orderBy(col("doc_id"))

  final case class ResizedMedia(doc_id: Long, width: Int, height: Int,
                                out_w: Int, out_h: Int, resize_hash: Long)

  /** Aspect-preserving fit of (w, h) into a `box`×`box` square,
    * longest side pinned to `box`, never upscaled. Pure integer
    * arithmetic (floor division) so the geometry replays exactly on
    * any engine — no float scale factor to round differently.
    */
  private[graft] def fitBox(w: Int, h: Int, box: Int): (Int, Int) = {
    val m = math.max(w, h)
    if (m <= box) (w, h)
    else (math.max(1, w * box / m), math.max(1, h * box / m))
  }

  /** 24-bit uncompressed BMP → (width, height, bottom-up pixel rows
    * as raw BGR bytes, 4-byte-aligned stride stripped). Only the
    * format the real-decode spec exercises; anything else falls back
    * to the deterministic fake in [[resizeMedia]].
    */
  private[graft] def bmpPixels(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (decodeBmp(0L, b).isEmpty || b.length < 54) return None
    if (u16(b, 28) != 24 || u32(b, 30) != 0L) return None // 24bpp, BI_RGB only
    val w = u32(b, 18).toInt
    val h = math.abs(u32(b, 22).toInt)
    val off = u32(b, 10).toInt
    val stride = (w * 3 + 3) & ~3
    if (off < 54 || off.toLong + stride.toLong * h > b.length) return None
    val px = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      System.arraycopy(b, off + y * stride, px, y * w * 3, w * 3)
      y += 1
    }
    Some((w, h, px))
  }

  /** m4: resize — the third leg of the decode/feature/frame plumbing.
    * Each payload's dimensions are fit into a `box`×`box` square
    * ([[fitBox]], integer-exact); the pixel work is REAL
    * nearest-neighbor resampling for 24-bit BMPs (spec-covered on
    * hand-built bitmaps) and a deterministic dims-folded content hash
    * for codec-requiring payloads, exactly m2's stub contract. Runs
    * per-partition like m2/m3 so a real codec's resize kernel slots
    * in without touching the plan: one narrow mapPartitions pass,
    * zero shuffle, output O(docs) regardless of media size.
    */
  def resizeMedia(docs: DataFrame, box: Int = 224): Dataset[ResizedMedia] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val binary = docs
      .withColumn("payload", encode(col("text"), "UTF-8"))
      // null payload (failed fetch / null source text) has nothing to
      // decode: skip the row, never hand the kernel a null array
      .filter(col("payload").isNotNull)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
    binary.mapPartitions { batch =>
      batch.map { case (id, bytes) => resizeOne(id, bytes, box) }
    }
  }

  /** Per-payload resize kernel (the unit the spec exercises on real
    * BMP bytes directly, since the verified corpus carries text).
    */
  private[graft] def resizeOne(id: Long, bytes: Array[Byte], box: Int): ResizedMedia =
    bmpPixels(bytes) match {
      case Some((w, h, px)) =>
        val (ow, oh) = fitBox(w, h, box)
        val out = new Array[Byte](ow * oh * 3)
        var y = 0
        while (y < oh) {
          val sy = y * h / oh
          var x = 0
          while (x < ow) {
            val sx = x * w / ow
            System.arraycopy(px, (sy * w + sx) * 3, out, (y * ow + x) * 3, 3)
            x += 1
          }
          y += 1
        }
        ResizedMedia(id, w, h, ow, oh, java.util.Arrays.hashCode(out).toLong)
      case None =>
        val m = decode(id, bytes)
        val (ow, oh) = fitBox(m.width, m.height, box)
        var hh = 1125899906842597L
        var i = 0
        while (i < bytes.length) { hh = 31 * hh + bytes(i); i += 1 }
        ResizedMedia(id, m.width, m.height, ow, oh,
          31 * (31 * hh + ow) + oh)
    }

  final case class MediaHash(doc_id: Long, phash: Long)

  /** Difference-hash (dHash) kernel over 24-bit BMP pixels: luminance
    * is nearest-neighbor-resampled (the m4 kernel geometry, integer-
    * exact) onto a 9×8 grid and each of the 64 bits records whether
    * luminance rises left-to-right between horizontal neighbors — the
    * classic perceptual fingerprint that is invariant to uniform
    * brightness shifts (gradient signs don't move) and to resizing
    * (the grid re-samples the same geometry), which byte-level hashes
    * (m1's md5) are blind to.
    */
  private[graft] def dHashBmp(w: Int, h: Int, px: Array[Byte]): Long = {
    var hash = 0L
    var y = 0
    while (y < 8) {
      val sy = y * h / 8
      var lastLum = 0
      var x = 0
      while (x < 9) {
        val sx = x * w / 9
        val o = (sy * w + sx) * 3
        // BGR byte order; integer Rec.601 luma
        val lum = ((px(o + 2) & 0xff) * 299 + (px(o + 1) & 0xff) * 587 +
          (px(o) & 0xff) * 114) / 1000
        if (x > 0 && lum > lastLum) hash |= 1L << (y * 8 + (x - 1))
        lastLum = lum
        x += 1
      }
      y += 1
    }
    hash
  }

  /** m5: perceptual-hash near-dup grouping for media payloads — the
    * image-side analogue of d1's exact text dedup: identical-looking
    * images (re-encodes, brightness shifts, resizes) collapse onto
    * one dHash bucket even when their bytes differ. REAL dHash for
    * 24-bit BMPs ([[dHashBmp]], spec-covered on hand-built bitmaps
    * including a brightness-shifted copy); the deterministic
    * content-fold fake stands in for codec-requiring payloads (m2's
    * stub contract — swap in a codec and the plan is unchanged).
    * Scale shape: one narrow per-partition hash pass, then ONE
    * shuffle keyed on the 8-byte hash (never on pixels) for the
    * group verdict — keeper = min doc_id, d1's deterministic rule.
    */
  def phashDupes(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hashed = docs
      .withColumn("payload", encode(col("text"), "UTF-8"))
      // null payload (failed fetch / null source text) has nothing to
      // decode: skip the row, never hand the kernel a null array
      .filter(col("payload").isNotNull)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) =>
          val ph = bmpPixels(bytes) match {
            case Some((w, h, px)) => dHashBmp(w, h, px)
            case None =>
              var hh = 1125899906842597L
              var i = 0
              while (i < bytes.length) { hh = 31 * hh + bytes(i); i += 1 }
              hh
          }
          MediaHash(id, ph)
        }
      }.toDF()
    val groups = Window.partitionBy(col("phash"))
    hashed
      .withColumn("n_copies", count(lit(1)).over(groups))
      .withColumn("keeper_id", min(col("doc_id")).over(groups))
      .select(col("doc_id"), col("phash"), col("n_copies"),
        (col("doc_id") === col("keeper_id")).as("keep"))
  }

  // ---- Verified entry points ----

  /** Format mix report (m6): the corpus-composition table for a
    * multimodal lake — per sniffed magic prefix, media count, total
    * bytes, and distinct payload count (embedded exact-dup rate per
    * format). Groups m1's zero-shuffle meta frame on the tiny magic
    * key; the only exchange is the final map-side-combined agg.
    */
  def formatMix(docs: DataFrame): DataFrame =
    binaryMeta(docs)
      .groupBy(col("magic_hex"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("byte_len")).as("total_bytes"),
        countDistinct(col("content_md5")).as("n_distinct"))

  /** Verified entry (m6). Sort is oracle-determinism only. */
  def m6(spark: SparkSession, dir: String): DataFrame =
    formatMix(graft.Tables.documents(spark, dir)).orderBy(col("magic_hex"))

  def m1(spark: SparkSession, dir: String): DataFrame =
    binaryMeta(Tables.documents(spark, dir)).orderBy(col("doc_id"))

  def m2(spark: SparkSession, dir: String): DataFrame =
    featureExtract(Tables.documents(spark, dir)).toDF().orderBy(col("doc_id"))

  def m3(spark: SparkSession, dir: String): DataFrame =
    frameSample(Tables.documents(spark, dir)).toDF()
      .orderBy(col("doc_id"), col("frame_idx"))

  final case class Tile(doc_id: Long, tile_x: Int, tile_y: Int,
                        px_w: Int, px_h: Int)

  /** m10: patch-grid tiling — the ViT-patch / tile-inference planning
    * pass: each image decodes to (w, h) and fans out into its
    * ceil(w/tile)×ceil(h/tile) grid, edge tiles carrying their true
    * (possibly short) pixel extent. A vision-encoder pipeline maps
    * each tile row to one patch embedding; the grid metadata is what
    * the batcher packs. STUB decode as in m2 (same kernel, same
    * honest contract: a real codec swaps in behind `decode` and
    * nothing downstream changes).
    *
    * Scale shape: per-doc fan-out is bounded by the decode law's max
    * dims (stub: ≤1087px → ≤17×17 = 289 tiles; a real deployment
    * bounds it by resize — m4's kernel — first), so downstream rows
    * stay O(docs × tiles): the m3 bounded-fan-out property. Narrow,
    * zero shuffles.
    */
  def imageTiles(docs: DataFrame, tile: Int = 64): Dataset[Tile] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(tile > 0)
    docs
      .withColumn("payload", encode(col("text"), "UTF-8"))
      // null payload (failed fetch / null source text) has nothing to
      // decode: skip the row, never hand the kernel a null array
      .filter(col("payload").isNotNull)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.flatMap { case (id, bytes) =>
          val m = decode(id, bytes)
          val (nx, ny) = ((m.width + tile - 1) / tile, (m.height + tile - 1) / tile)
          for {
            ty <- (0 until ny).iterator
            tx <- (0 until nx).iterator
          } yield Tile(id, tx, ty,
            math.min(tile, m.width - tx * tile),
            math.min(tile, m.height - ty * tile))
        }
      }
  }

  def m10(spark: SparkSession, dir: String): DataFrame =
    imageTiles(Tables.documents(spark, dir)).toDF()
      .orderBy(col("doc_id"), col("tile_y"), col("tile_x"))

  /** m11: cross-video repeated-frame report — the "same clip embedded
    * in many videos" detector (intros, watermarked stock footage,
    * re-uploads): m3's sampled frames keyed by a per-frame CONTENT
    * identity and grouped across documents, kept where ≥ minDocs
    * distinct docs share a frame. x26's chunk-dedup shape at the
    * video grain: the frame stream is bounded (m3's stride contract),
    * duplicates collapse map-side on the ONE key shuffle, never
    * pairwise — a million-way repeated intro is one group.
    *
    * Stub identity, honestly labeled: with a real codec the frame
    * key is m5's perceptual dHash of the decoded frame; offline, the
    * stand-in is t3's normalized content fingerprint (order-
    * insensitive token-set md5) scoped per frame index — so "same
    * clip" ≡ "same normalized payload content", which is exactly the
    * fuzzy-exact identity the corpus can express (the raw byte-fold
    * stub hash of m3 can only ever collide on byte-identical files,
    * which the sf0.01 corpus has none of — a 0-row report verifies
    * nothing).
    */
  def clipDedupReport(docs: DataFrame, maxFrames: Int = 4,
                      minDocs: Int = 2): DataFrame = {
    val fp = docs.withColumn("__fp", md5(array_join(array_sort(
        array_distinct(split(lower(col("text")), "\\s+"))), " ")))
      .select(col("doc_id"), col("__fp"))
    frameSample(docs, maxFrames).toDF()
      .join(fp, Seq("doc_id"))
      .withColumn("clip_key",
        md5(concat(col("__fp"), lit(":"), col("frame_idx").cast("string"))))
      .groupBy(col("clip_key"))
      .agg(count(lit(1)).as("n_frames"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") >= minDocs)
  }

  def m11(spark: SparkSession, dir: String): DataFrame =
    clipDedupReport(Tables.documents(spark, dir)).orderBy(col("clip_key"))

  def m4(spark: SparkSession, dir: String): DataFrame =
    resizeMedia(Tables.documents(spark, dir)).toDF().orderBy(col("doc_id"))

  /** Verified entry (m5). Sort is oracle-determinism only. */
  def m5(spark: SparkSession, dir: String): DataFrame =
    phashDupes(Tables.documents(spark, dir)).orderBy(col("doc_id"))

  final case class AudioStats(doc_id: Long, is_pcm: Boolean, n_samples: Long,
                              duration_ms: Long, rms: Double, peak: Long)

  /** m7: per-payload audio sample statistics — the loudness/duration
    * gate a speech-curation pipeline runs before paying for
    * transcription (too-short, silent, or clipped clips drop here).
    * REAL kernel for 16-bit PCM WAV payloads ([[wavPcmStats]]:
    * chunk-walk + exact long-accumulated sum of squares, spec-covered
    * on synthesized tones); the m2-contract deterministic content
    * fold stands in for codec-requiring formats — its derived fields
    * use only unsigned shifts and power-of-two moduli, so the signed
    * 64-bit fold replays exactly as HUGEINT arithmetic (m5's oracle
    * technique; a non-power-of-two modulus would diverge between the
    * signed and mod-2⁶⁴ views). One narrow mapPartitions pass (codec
    * init amortizes per batch), zero shuffles, O(docs) output; rms
    * rounds once at the boundary (single double op — no summation
    * drift, the kernel accumulates integers).
    */
  def audioStats(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withColumn("payload", encode(col("text"), "UTF-8"))
      // null payload (failed fetch / null source text) has nothing to
      // decode: skip the row, never hand the kernel a null array
      .filter(col("payload").isNotNull)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) =>
          wavPcmStats(bytes) match {
            case Some((n, durMs, rms, peak)) =>
              AudioStats(id, is_pcm = true, n.toLong, durMs, rms, peak.toLong)
            case None =>
              // unsigned-byte fold; ASCII-only oracle-parity contract
              // (see fakeDecode Scaladoc) — masked so non-ASCII bytes
              // still hash deterministically instead of sign-flipping
              var h = 1125899906842597L
              var i = 0
              while (i < bytes.length) { h = 31 * h + (bytes(i) & 0xff); i += 1 }
              val n = 1L + ((h >>> 13) % 65536L)
              val peak = (h >>> 29) % 32768L
              // k/4096·32768 = 8k — an integer-valued double, so the
              // boundary round is exact on any engine
              val rms = ((h >>> 44) % 4096L).toDouble * 8.0
              AudioStats(id, is_pcm = false, n, n * 1000L / 16000L, rms, peak)
          }
        }
      }
      .toDF()
      .withColumn("rms", round(col("rms"), 4))
  }

  /** Verified entry (m7). Sort is oracle-determinism only. */
  def m7(spark: SparkSession, dir: String): DataFrame =
    audioStats(Tables.documents(spark, dir)).orderBy(col("doc_id"))

  final case class ByteEntropy(doc_id: Long, byte_len: Long, n_distinct: Long,
                               entropy_bits: Double)

  /** m8: per-payload byte entropy — the compressed/encrypted
    * detector for a multimodal lake (a "JPEG" near 8 bits/byte is a
    * real codec stream; a "WAV" at 2 bits/byte is silence or
    * padding; an 8-bit-entropy payload in a TEXT column is
    * exfiltrated binary). H = log2(n) − (Σ c·log2 c)/n over the
    * 256-bin byte histogram — t10's sorted-fold entropy law applied
    * to BYTES: counts accumulate as exact longs in one pass and the
    * double fold walks the histogram in fixed bin order (0..255), so
    * the result replays bit-for-bit. Narrow mapPartitions kernel,
    * zero shuffles, O(docs) output.
    */
  def byteEntropy(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withColumn("payload", encode(col("text"), "UTF-8"))
      // null payload (failed fetch / null source text) has nothing to
      // decode: skip the row, never hand the kernel a null array
      .filter(col("payload").isNotNull)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) =>
          val counts = new Array[Long](256)
          var i = 0
          while (i < bytes.length) { counts(bytes(i) & 0xff) += 1; i += 1 }
          val n = bytes.length.toDouble
          var sum = 0.0
          var distinct = 0L
          var b = 0
          while (b < 256) {
            val c = counts(b)
            if (c > 0) {
              distinct += 1
              sum += c * (math.log(c.toDouble) / math.log(2.0))
            }
            b += 1
          }
          val h =
            if (bytes.length == 0) 0.0
            else math.log(n) / math.log(2.0) - sum / n
          ByteEntropy(id, bytes.length.toLong, distinct, h)
        }
      }
      .toDF()
      // 4dp round at the frame boundary (Spark's HALF_UP on the
      // shortest-decimal repr — t10's law; it also absorbs the
      // oracle's unordered-bin summation noise)
      .withColumn("entropy_bits", round(col("entropy_bits"), 4))
  }

  /** Verified entry (m8). Sort is oracle-determinism only. */
  def m8(spark: SparkSession, dir: String): DataFrame =
    byteEntropy(Tables.documents(spark, dir)).orderBy(col("doc_id"))

  /** m12: ASR chunk plan — the segmentation step between raw audio
    * and a transcription fleet (Whisper-style models take fixed
    * windows; overlap preserves words that straddle a boundary, and
    * the plan is what a scheduler fans out, so it must be exact and
    * reproducible BEFORE any codec runs). Windows of `winMs` every
    * `strideMs` over each payload's duration: a clip at or under one
    * window is a single chunk; otherwise 1 + ceil((dur−win)/stride)
    * chunks, the last truncated to the clip end — x25's
    * doc-chunking law applied to time instead of tokens.
    *
    * Durations come from [[audioStats]] (m7): the REAL PCM-WAV
    * kernel where payloads admit it, the deterministic content fold
    * elsewhere — so the plan is oracle-replayable end to end, and
    * the decode stub swaps out for a codec without touching the
    * plan math. All integers: the ceil is `(x + stride−1) div
    * stride` on non-negative operands (Spark div ≡ DuckDB floor-//),
    * starts/ends are pure multiplies with a `least` clamp.
    *
    * Scale shape: m7's narrow mapPartitions pass, then a bounded
    * `sequence` explode (fan-out = duration/stride per clip — the
    * clip's own length, never a global constant), zero shuffles,
    * O(total chunks) output.
    */
  def audioChunkPlan(docs: DataFrame, winMs: Long = 1000L,
                     strideMs: Long = 800L): DataFrame =
    audioStats(docs)
      .select(col("doc_id"), col("is_pcm"), col("duration_ms"))
      .withColumn("n_chunks",
        when(col("duration_ms") <= winMs, lit(1L))
          .otherwise(lit(1L) +
            expr(s"(duration_ms - $winMs + ${strideMs - 1}) div $strideMs")))
      .withColumn("chunk_idx", explode(sequence(lit(0L), col("n_chunks") - 1)))
      .select(col("doc_id"), col("is_pcm"), col("duration_ms"), col("n_chunks"),
        col("chunk_idx"),
        (col("chunk_idx") * strideMs).as("start_ms"),
        least(col("chunk_idx") * strideMs + winMs, col("duration_ms")).as("end_ms"))

  /** Verified entry (m12). Sort is oracle-determinism only. */
  def m12(spark: SparkSession, dir: String): DataFrame =
    audioChunkPlan(Tables.documents(spark, dir))
      .orderBy(col("doc_id"), col("chunk_idx"))
}
