package graft.ops

import graft.core.{Doc, Hashing}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns for the interleaved docs table.
  *
  * Media payloads are opaque `binary` columns with a typed metadata struct.
  * The decode step is STUBBED (no image/audio codecs ship in this
  * container): `decodeStub` parses a deterministic fake header instead of
  * running a real codec — but the Spark-side plumbing is the real thing a
  * 100 TB pipeline needs and is fully exercised:
  *   - schema: (doc_id, span_idx, kind, media_ref, payload: binary,
  *              meta: struct<width,height,frames,sample_rate,format>)
  *   - batched `mapPartitions` decode (codec setup amortized per batch,
  *     exactly like the detector kernel)
  *   - feature extraction → fixed-dim array<float> column that feeds the
  *     Similarity/Dedup operators unchanged
  *   - frame sampling for video-kind payloads (deterministic stride)
  */
object Multimodal {

  case class MediaMeta(width: Int, height: Int, frames: Int, sample_rate: Int, format: String)

  case class MediaItem(
      doc_id: String,
      span_idx: Int,
      kind: String,
      media_ref: String,
      payload: Array[Byte])

  case class DecodedMedia(
      doc_id: String,
      span_idx: Int,
      kind: String,
      media_ref: String,
      meta: MediaMeta,
      features: Array[Float])

  val FeatureDim = 16

  /** Deterministic fake payload for a media_ref — stands in for bytes that
    * would come from object storage; first 16 bytes act as the "header".
    */
  def syntheticPayload(mediaRef: String, len: Int = 256): Array[Byte] = {
    val out = new Array[Byte](len)
    var i = 0
    while (i < len) {
      out(i) = (Hashing.hash2(Hashing.hashString(mediaRef), i) & 0xFF).toByte
      i += 1
    }
    out
  }

  /** Extract media spans of the docs table into the media table shape,
    * attaching payloads (synthetic here; `binary` column either way).
    */
  def mediaTable(docs: Dataset[Doc]): Dataset[MediaItem] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.flatMap { d =>
      d.spans.zipWithIndex.collect {
        case (s, i) if s.kind != "text" =>
          MediaItem(d.doc_id, i, s.kind, s.media_ref, syntheticPayload(s.media_ref))
      }
    }
  }

  /** STUB decode: a real implementation would hand `payload` to a codec
    * (libjpeg/ffmpeg) here. The stub derives metadata deterministically
    * from the header bytes so tests are stable; the call shape (bytes in,
    * struct + features out, batched per partition) is the production one.
    */
  def decodeStub(item: MediaItem): DecodedMedia = {
    val h = Hashing.hashString(item.media_ref)
    val meta = item.kind match {
      case "image" =>
        MediaMeta(64 + Hashing.pick(h, 16) * 64, 64 + Hashing.pick(Hashing.mix64(h), 16) * 64, 1, 0, "fake-jpeg")
      case "audio" =>
        MediaMeta(0, 0, 0, 8000 + Hashing.pick(h, 5) * 8000, "fake-pcm")
      case "video" =>
        MediaMeta(320, 240, 24 + Hashing.pick(h, 240), 0, "fake-h264")
      case other =>
        MediaMeta(0, 0, 0, 0, s"unknown-$other")
    }
    // "feature extraction": hashed byte histogram → fixed-dim float vector
    val feats = new Array[Float](FeatureDim)
    item.payload.foreach { b => feats((b & 0xFF) % FeatureDim) += 1f }
    val norm = math.sqrt(feats.map(f => f.toDouble * f).sum).toFloat
    val normed = if (norm > 0) feats.map(_ / norm) else feats
    DecodedMedia(item.doc_id, item.span_idx, item.kind, item.media_ref, meta, normed)
  }

  /** Batched decode over partitions — per-batch codec setup amortization,
    * mirroring the mention detector's batch loop.
    */
  def decode(media: Dataset[MediaItem], batchSize: Int = 32): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // (real codecs would init once per batch here)
        batch.iterator.map(decodeStub)
      }
    }
  }

  /** Deterministic frame sampling for video-kind media: every `stride`-th
    * frame index up to `maxFrames` — the plumbing for frame-level feature
    * extraction fan-out.
    */
  def sampleFrames(decoded: Dataset[DecodedMedia], stride: Int = 8, maxFrames: Int = 16): DataFrame = {
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded
      .filter(_.meta.frames > 0)
      .toDF()
      .withColumn("frame_idx",
        explode(slice(sequence(lit(0), col("meta.frames") - 1, lit(stride)), 1, maxFrames)))
      .select(col("doc_id"), col("span_idx"), col("media_ref"), col("frame_idx"))
  }
}
