package graft.ops

import graft.core.{Doc, Hashing}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns for the interleaved docs table.
  *
  * Media payloads are opaque `binary` columns with a typed metadata struct.
  * Decode is REAL for the container-free formats — RIFF/WAVE PCM16 audio
  * and uncompressed 24-bit BMP images are parsed from their actual bytes
  * (header sniff → typed metadata → feature extraction), no codec library
  * needed — and STUBBED only for codec-bound formats (video/h264, jpeg:
  * no ffmpeg/libjpeg ships in this container; `decodeStub` derives
  * deterministic fake metadata there). Either way the Spark-side plumbing
  * is the production shape a 100 TB pipeline needs:
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

  private def le16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xFF).toByte; b(off + 1) = ((v >> 8) & 0xFF).toByte
  }
  private def le32(b: Array[Byte], off: Int, v: Int): Unit = {
    le16(b, off, v & 0xFFFF); le16(b, off + 2, (v >>> 16) & 0xFFFF)
  }
  private def rdLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  private def rdLe32(b: Array[Byte], off: Int): Int =
    rdLe16(b, off) | (rdLe16(b, off + 2) << 16)

  /** A REAL (fully spec-compliant, deterministically generated) RIFF/WAVE
    * PCM16 mono file for a media_ref — playable bytes, not a fake header.
    */
  def syntheticWav(mediaRef: String): Array[Byte] = {
    val h = Hashing.hashString(mediaRef)
    val sampleRate = 8000 + Hashing.pick(h, 5) * 8000
    val nSamples = 64 + Hashing.pick(Hashing.mix64(h), 192)
    val dataSize = nSamples * 2
    val out = new Array[Byte](44 + dataSize)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    le32(out, 4, 36 + dataSize)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    le32(out, 16, 16) // fmt chunk size
    le16(out, 20, 1) // PCM
    le16(out, 22, 1) // mono
    le32(out, 24, sampleRate)
    le32(out, 28, sampleRate * 2) // byte rate
    le16(out, 32, 2) // block align
    le16(out, 34, 16) // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    le32(out, 40, dataSize)
    var i = 0
    while (i < nSamples) {
      le16(out, 44 + i * 2, (Hashing.hash2(h, i) & 0xFFFF).toInt)
      i += 1
    }
    out
  }

  /** A REAL uncompressed 24-bit BMP (BITMAPINFOHEADER) for a media_ref —
    * deterministic pixels, row stride padded to 4 bytes per the spec.
    */
  def syntheticBmp(mediaRef: String): Array[Byte] = {
    val h = Hashing.hashString(mediaRef)
    val width = 4 + Hashing.pick(h, 12)
    val height = 4 + Hashing.pick(Hashing.mix64(h), 12)
    val rowBytes = (width * 3 + 3) / 4 * 4
    val dataSize = rowBytes * height
    val out = new Array[Byte](54 + dataSize)
    out(0) = 'B'; out(1) = 'M'
    le32(out, 2, 54 + dataSize)
    le32(out, 10, 54) // pixel-data offset
    le32(out, 14, 40) // BITMAPINFOHEADER size
    le32(out, 18, width)
    le32(out, 22, height)
    le16(out, 26, 1) // planes
    le16(out, 28, 24) // bpp
    le32(out, 34, dataSize)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width * 3) {
        out(54 + y * rowBytes + x) = (Hashing.hash2(h, y * 4096 + x) & 0xFF).toByte
        x += 1
      }
      y += 1
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
          MediaItem(d.doc_id, i, s.kind, s.media_ref, payloadFor(s.kind, s.media_ref))
      }
    }
  }

  /** Payload generator per kind: REAL bytes for container-free formats
    * (audio → RIFF/WAVE PCM16, image → 24-bit BMP), opaque bytes for
    * codec-bound kinds (video), standing in for object-storage reads.
    */
  def payloadFor(kind: String, mediaRef: String): Array[Byte] = kind match {
    case "audio" => syntheticWav(mediaRef)
    case "image" => syntheticBmp(mediaRef)
    case _ => syntheticPayload(mediaRef)
  }

  private def histFeatures(bytes: Array[Byte], from: Int, until: Int): Array[Float] = {
    val feats = new Array[Float](FeatureDim)
    var i = from
    while (i < until) { feats((bytes(i) & 0xFF) % FeatureDim) += 1f; i += 1 }
    val norm = math.sqrt(feats.map(f => f.toDouble * f).sum).toFloat
    if (norm > 0) feats.map(_ / norm) else feats
  }

  /** REAL decode of the payload bytes, dispatched on the actual container
    * magic — not on the claimed `kind`:
    *  - `RIFF....WAVE` → PCM16 parse: fmt chunk (sample rate, channels),
    *    data chunk → sample count in `frames`; features = L2-normalized
    *    16-bucket histogram of the sample words;
    *  - `BM` → BITMAPINFOHEADER parse: width/height/bpp, stride-padded
    *    pixel rows; features = histogram of the pixel bytes (header and
    *    row padding excluded);
    *  - anything else → [[decodeStub]] (codec-bound formats: no
    *    ffmpeg/libjpeg in this container — honest stub, same call shape).
    */
  def decodeItem(item: MediaItem): DecodedMedia = {
    val p = item.payload
    if (p.length >= 44 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F'
      && p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E') {
      val sampleRate = rdLe32(p, 24)
      val dataSize = math.min(rdLe32(p, 40), p.length - 44)
      val nSamples = dataSize / 2
      DecodedMedia(item.doc_id, item.span_idx, item.kind, item.media_ref,
        MediaMeta(0, 0, nSamples, sampleRate, "wav-pcm16"),
        histFeatures(p, 44, 44 + dataSize))
    } else if (p.length >= 54 && p(0) == 'B' && p(1) == 'M') {
      // header fields are UNTRUSTED (decode dispatches on magic bytes, not
      // on the claimed kind): validate before they feed any array index —
      // a negative offset/height or an Int-overflowing width would throw
      // ArrayIndexOutOfBoundsException and fail the whole task (ADVICE r2).
      // All arithmetic in Long so hostile widths cannot overflow the check.
      val offset = rdLe32(p, 10)
      val width = rdLe32(p, 18)
      val height = rdLe32(p, 22)
      val rowBytes = (width.toLong * 3 + 3) / 4 * 4
      // division-based bound: rowBytes * height can overflow even Long for
      // hostile 32-bit width × height, so never form that product
      val avail = p.length.toLong - offset
      val valid = offset >= 54 && width > 0 && height > 0 &&
        rowBytes <= avail && height.toLong <= avail / rowBytes
      if (!valid) decodeStub(item)
      else {
        // histogram over pixel bytes only: skip the 4-byte row padding
        val feats = new Array[Float](FeatureDim)
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width * 3) {
            feats((p(offset + y * rowBytes.toInt + x) & 0xFF) % FeatureDim) += 1f
            x += 1
          }
          y += 1
        }
        val norm = math.sqrt(feats.map(f => f.toDouble * f).sum).toFloat
        DecodedMedia(item.doc_id, item.span_idx, item.kind, item.media_ref,
          MediaMeta(width, height, 1, 0, "bmp24"),
          if (norm > 0) feats.map(_ / norm) else feats)
      }
    } else decodeStub(item)
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
        // (codec-bound formats would init their codec once per batch here)
        batch.iterator.map(decodeItem)
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
