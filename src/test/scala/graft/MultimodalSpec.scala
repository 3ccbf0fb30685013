package graft

import graft.data.DocsGen
import graft.ops.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal decode: the container-free formats (WAV PCM16, BMP 24-bit)
  * are REAL bytes and REAL parses — cross-checked against the JDK's own
  * independent readers (javax.sound.sampled for WAV, javax.imageio for
  * BMP), so a header-layout bug in either the generator or our decoder
  * cannot self-confirm. Codec-bound kinds (video) fall back to the
  * declared stub.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTest.spark

  test("synthetic WAV bytes parse with the JDK's AudioSystem and our decoder agrees with it") {
    for (ref <- Seq("a0", "media-7", "x/y/z.wav")) {
      val bytes = Multimodal.syntheticWav(ref)
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      val d = Multimodal.decodeItem(Multimodal.MediaItem("d", 0, "audio", ref, bytes))
      assert(d.meta.format == "wav-pcm16")
      assert(d.meta.sample_rate == fmt.getSampleRate.toInt)
      assert(fmt.getChannels == 1 && fmt.getSampleSizeInBits == 16)
      assert(d.meta.frames == ais.getFrameLength.toInt) // PCM: 1 frame = 1 sample
      val n = math.sqrt(d.features.map(f => f.toDouble * f).sum)
      assert(math.abs(n - 1.0) < 1e-5)
    }
  }

  test("synthetic BMP bytes parse with the JDK's ImageIO and our decoder agrees with it") {
    for (ref <- Seq("img0", "media-3", "p/q.bmp")) {
      val bytes = Multimodal.syntheticBmp(ref)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"JDK ImageIO could not parse the BMP for $ref")
      val d = Multimodal.decodeItem(Multimodal.MediaItem("d", 0, "image", ref, bytes))
      assert(d.meta.format == "bmp24")
      assert(d.meta.width == img.getWidth && d.meta.height == img.getHeight)
      val n = math.sqrt(d.features.map(f => f.toDouble * f).sum)
      assert(math.abs(n - 1.0) < 1e-5)
    }
  }

  test("decode dispatches on container magic: opaque payloads fall back to the stub") {
    val d = Multimodal.decodeItem(
      Multimodal.MediaItem("d", 0, "video", "v1", Multimodal.syntheticPayload("v1")))
    assert(d.meta.format == "fake-h264" && d.meta.frames > 0)
  }

  test("frame sampling strides video frames deterministically and skips frameless media") {
    import spark.implicits._
    val docs = DocsGen.docs(DocsGen.gen(spark, 200, seed = 12L))
    val decoded = Multimodal.decode(Multimodal.mediaTable(docs))
    val frames = Multimodal.sampleFrames(decoded, stride = 8, maxFrames = 16)
      .as[(String, Int, String, Int)].collect()
    assert(frames.nonEmpty)
    // every sampled index is a stride multiple below the media's frame count
    val frameCounts = decoded.collect()
      .map(d => (d.doc_id, d.span_idx) -> d.meta.frames).toMap
    frames.foreach { case (docId, spanIdx, _, idx) =>
      assert(idx % 8 == 0 && idx < frameCounts((docId, spanIdx)))
    }
    // at most maxFrames per media item; frameless media (audio/images with
    // frames<=1 carry no video frames... images have frames=1) contribute
    // only their in-range indices
    val perItem = frames.groupBy(f => (f._1, f._2)).values.map(_.length)
    assert(perItem.max <= 16)
  }

  test("distributed batched decode equals the local per-item decode over the docs media table") {
    import spark.implicits._
    val docs = DocsGen.docs(DocsGen.gen(spark, 150, seed = 11L))
    val media = Multimodal.mediaTable(docs)
    val dist = Multimodal.decode(media, batchSize = 8).collect()
      .map(d => (d.doc_id, d.span_idx) -> (d.meta, d.features.toSeq)).toMap
    val local = media.collect()
      .map(i => (i.doc_id, i.span_idx) -> {
        val d = Multimodal.decodeItem(i); (d.meta, d.features.toSeq)
      }).toMap
    assert(dist.nonEmpty && dist == local)
    // real formats actually flow through: both wav and bmp parses present
    val formats = dist.values.map(_._1.format).toSet
    assert(formats.contains("wav-pcm16") && formats.contains("bmp24"))
  }
}
