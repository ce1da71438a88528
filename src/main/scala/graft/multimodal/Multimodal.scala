package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns with typed metadata, processed in
  * partition-sized batches.
  *
  * The decode step itself is STUBBED (no image/audio codecs in this
  * environment) with a deterministic fake derived from the content
  * hash; everything around it — the binary schema, the
  * partition-batched execution shape, the typed output — is the real
  * production plumbing. Swap `fakeDecode` for a codec call and
  * nothing else changes.
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
    * codec initialization across the batch.
    *
    * STUB: `fakeDecode` fabricates deterministic dimensions from the
    * content bytes (stands in for an image decode; no codec libs in
    * this container).
    */
  def featureExtract(docs: DataFrame): Dataset[MediaFeatures] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val binary = docs
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
    binary.mapPartitions { batch =>
      // per-partition init happens HERE (codec/model handle)
      batch.map { case (id, bytes) => fakeDecode(id, bytes) }
    }
  }

  /** Deterministic stand-in for a real decoder. */
  private def fakeDecode(id: Long, bytes: Array[Byte]): MediaFeatures = {
    var h = 1125899906842597L // FNV-ish rolling hash over content
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
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
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
    binary.mapPartitions { batch =>
      batch.flatMap { case (id, bytes) =>
        val m = fakeDecode(id, bytes)
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

  // ---- Verified entry points ----

  def m1(spark: SparkSession, dir: String): DataFrame =
    binaryMeta(Tables.documents(spark, dir)).orderBy(col("doc_id"))

  def m2(spark: SparkSession, dir: String): DataFrame =
    featureExtract(Tables.documents(spark, dir)).toDF().orderBy(col("doc_id"))

  def m3(spark: SparkSession, dir: String): DataFrame =
    frameSample(Tables.documents(spark, dir)).toDF()
      .orderBy(col("doc_id"), col("frame_idx"))
}
