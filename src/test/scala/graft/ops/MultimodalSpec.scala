package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ops.Multimodal.MediaRecord

/** Real-codec multimodal decode: images (JDK ImageIO — PNG/BMP) and WAV
  * audio (JDK javax.sound), exercised on media generated in-test by the
  * same JDK APIs, with features asserted against hand-computed exact
  * values (the decode math is integer, so equality is exact, not
  * tolerance-based).
  */
class MultimodalSpec extends SparkTestBase {

  import spark.implicits._

  private def png(img: BufferedImage): Array[Byte] = encode(img, "png")
  private def bmp(img: BufferedImage): Array[Byte] = encode(img, "bmp")
  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, out), s"JDK lacks $fmt writer")
    out.toByteArray
  }

  private def solid(w: Int, h: Int, rgb: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    img
  }

  /** 2×2 checkerboard: (0,0)/(1,1) white, (1,0)/(0,1) black. */
  private def checker2: BufferedImage = {
    val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xffffff); img.setRGB(1, 1, 0xffffff)
    img.setRGB(1, 0, 0x000000); img.setRGB(0, 1, 0x000000)
    img
  }

  test("decodeImages: real PNG/BMP decode with exact integer luma") {
    val records = Seq(
      MediaRecord(1L, "image", png(solid(4, 2, 0xff0000))), // red
      MediaRecord(2L, "image", bmp(solid(3, 3, 0x808080))), // mid gray
      MediaRecord(3L, "image", png(checker2)),
      MediaRecord(4L, "image", "not an image at all".getBytes("UTF-8")),
    )
    val feats = Multimodal
      .decodeImages(spark.createDataset(records).repartition(3))
      .collect().map(f => f.doc_id -> f).toMap

    assert(feats.keySet == Set(1L, 2L, 3L), "non-image payload must drop")
    // solid red: luma = 299·255 exactly, any pixel count
    assert(feats(1L).width == 4 && feats(1L).height == 2 && feats(1L).n_pixels == 8)
    assert(feats(1L).mean_luma_milli == 299L * 255)
    // solid 0x80 gray: (299+587+114)·128 = 128000
    assert(feats(2L).mean_luma_milli == 1000L * 128)
    // checkerboard: 2 white (255000) + 2 black (0) → mean 127500
    assert(feats(3L).mean_luma_milli == 127500L)
  }

  test("resizeImages: nearest-neighbour grid is exact and deterministic") {
    val rec = Seq(MediaRecord(7L, "image", png(checker2)))
    val grid = Multimodal.resizeImages(spark.createDataset(rec), side = 4)
      .select("pixels").head().getSeq[Int](0)
    // src index = i·2/4 → grid positions 0,1 sample pixel 0; 2,3 sample 1
    val w = 255; val b = 0
    val expected = Seq(
      w, w, b, b,
      w, w, b, b,
      b, b, w, w,
      b, b, w, w)
    assert(grid == expected)
    // re-run on a different partitioning: bit-identical
    val again = Multimodal
      .resizeImages(spark.createDataset(rec).repartition(4), side = 4)
      .select("pixels").head().getSeq[Int](0)
    assert(again == expected)
  }

  private def wav(samples: Array[Short], rate: Float = 8000f): Array[Byte] = {
    val fmt = new AudioFormat(rate, 16, 1, true, false) // PCM16 mono LE
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val out = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new ByteArrayInputStream(pcm), fmt, samples.length),
      AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("decodeWavs: real WAV decode with exact RMS sum of squares") {
    val samples = Array[Short](1000, -1000, 1000, -1000, 500, -500)
    val records = Seq(
      MediaRecord(1L, "audio", wav(samples)),
      MediaRecord(2L, "audio", "definitely not riff".getBytes("UTF-8")),
    )
    val feats = Multimodal.decodeWavs(spark.createDataset(records)).collect()
    assert(feats.map(_.doc_id).toSeq == Seq(1L), "non-WAV payload must drop")
    val f = feats.head
    assert(f.sample_rate == 8000 && f.channels == 1 && f.bits == 16)
    assert(f.n_frames == samples.length)
    assert(f.sq_sum == samples.map(s => s.toLong * s).sum) // 4·10⁶ + 2·25·10⁴
  }

  test("decode paths survive empty and truncated payloads") {
    val junk = Seq(
      MediaRecord(1L, "image", Array.emptyByteArray),
      MediaRecord(2L, "image", png(solid(2, 2, 0x123456)).take(10)), // truncated
      MediaRecord(3L, "audio", Array.emptyByteArray),
    )
    val ds = spark.createDataset(junk)
    assert(Multimodal.decodeImages(ds).count() == 0)
    assert(Multimodal.resizeImages(ds, 4).count() == 0)
    assert(Multimodal.decodeWavs(ds).count() == 0)
  }
}
