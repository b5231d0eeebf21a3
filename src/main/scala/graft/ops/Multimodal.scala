package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling (SURVEY.md §7.4): media as opaque `binary`
  * payloads with typed metadata, decoded/feature-extracted via typed
  * partition-wise map.
  *
  * Decode is REAL where the JDK ships a codec: images via `javax.imageio`
  * (PNG/BMP/JPEG/GIF — [[decodeImages]], [[resizeImages]]) and WAV audio
  * via `javax.sound.sampled` ([[decodeWavs]]), both pure Java SE, no
  * external libraries. Feature math is integer/rational arithmetic
  * (ITU-R 601 luma, nearest-neighbour sampling, exact RMS sums) so
  * outputs are bit-deterministic across JVMs and partitionings. Only
  * codec-less modalities (video) keep the clearly-marked deterministic
  * STUB path (`decodeStub`), which also serves the gate fixture whose
  * payloads are text bytes, not media. Either way the Spark plumbing is
  * identical and production-shaped: binary schema, case-class encoders, a
  * `mapPartitions` batch boundary (one codec init per partition, the same
  * shape a JNI/FFI decoder wants), and flat scalar feature output that
  * downstream relational operators can use.
  */
object Multimodal {

  /** Opaque media record: id + modality tag + raw bytes. */
  case class MediaRecord(doc_id: Long, kind: String, payload: Array[Byte])

  /** Flat features extracted from a payload (hash-check friendly). */
  case class MediaFeatures(
      doc_id: Long,
      kind: String,
      n_bytes: Int,
      head_byte: Int,
      byte_sum_16: Long,
      fake_width: Int,
      fake_height: Int,
  )

  /** Wrap a text column as binary payloads — the ingest shape for media
    * stored inline (small images/audio clips) next to typed metadata.
    */
  def asBlobs(df: DataFrame, idCol: String, srcCol: String, kind: String): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      col(idCol).cast("long").as("doc_id"),
      lit(kind).as("kind"),
      col(srcCol).cast("binary").as("payload"),
    ).as[MediaRecord]
  }

  /** STUB decoder: deterministic fake of a codec's header parse, for
    * modalities with no JDK codec (video) and for non-media payloads
    * (the gate fixture wraps text bytes). Real-codec paths live in
    * [[decodeImages]]/[[decodeWavs]]; the signature (bytes in, flat
    * features out) and the partition-wise execution shape are identical,
    * so swapping a codec in never changes the plan.
    */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val p = r.payload
    val headByte = if (p.length > 0) p(0) & 0xff else 0
    val second = if (p.length > 1) p(1) & 0xff else 0
    MediaFeatures(
      doc_id = r.doc_id,
      kind = r.kind,
      n_bytes = p.length,
      head_byte = headByte,
      byte_sum_16 = p.take(16).map(b => (b & 0xff).toLong).sum,
      fake_width = 1 + headByte % 64,
      fake_height = 1 + second % 64,
    )
  }

  /** Partition-wise decode: one iterator pass per partition so a real
    * codec initializes once per task, not once per row.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // real impl: init codec here, close via CompletionIterator
      it.map(decodeStub)
    }
  }

  /** Resize stub: nearest-neighbour downsample of the payload to a fixed
    * `side × side` byte grid — the plumbing shape of image resizing
    * (fixed-size output schema regardless of input size, so downstream
    * batches are uniform). A real impl swaps the byte sampling for a
    * codec's scaler; the output contract is unchanged.
    */
  def resizeStub(media: Dataset[MediaRecord], side: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val n = side * side
    media
      .mapPartitions { it =>
        it.map { r =>
          val len = r.payload.length
          val grid =
            if (len == 0) Array.fill(n)(0)
            else Array.tabulate(n)(i => r.payload((i.toLong * len / n).toInt) & 0xff)
          (r.doc_id, side, grid)
        }
      }
      .toDF("doc_id", "side", "pixels")
  }

  /** Decoded image features: real codec output, deterministic math. */
  case class ImageFeatures(
      doc_id: Long,
      width: Int,
      height: Int,
      n_pixels: Long,
      mean_luma_milli: Long, // ITU-R 601 luma ×1000, integer-exact
  )

  /** REAL image decode via the JDK's `javax.imageio` (PNG/BMP/JPEG/GIF).
    * Payloads that aren't decodable images are dropped (flatMap), the
    * standard skip-corrupt posture for a 100 TB media sweep — count the
    * drop rate upstream with a cheap magic-byte filter if it matters.
    * Mean luma uses the integer ITU-R 601 weights (299/587/114 per
    * mille) summed exactly in a Long, so the feature is bit-identical
    * regardless of partitioning or JVM.
    */
  def decodeImages(media: Dataset[MediaRecord]): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // ImageIO scans its reader registry per call; per-partition reuse
      // of the input-stream wrapper is the codec-init-once shape
      it.flatMap { r =>
        decodeOne(r.payload).map { bi =>
          val (w, h) = (bi.getWidth, bi.getHeight)
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = bi.getRGB(x, y)
              sum += 299L * ((rgb >> 16) & 0xff) +
                587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          ImageFeatures(r.doc_id, w, h, w.toLong * h, sum / (w.toLong * h))
        }
      }
    }
  }

  private def decodeOne(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    catch { case scala.util.control.NonFatal(_) => None }

  /** REAL image resize: decode, then nearest-neighbour sample onto a
    * fixed `side × side` luma grid. Sampling is explicit integer math
    * (`src = i·dim/side`) rather than Graphics2D scaling, so the output
    * is deterministic across JVMs — the property a hash-checked pipeline
    * needs and a codec's interpolating scaler can't promise. Output
    * schema is fixed-size regardless of input dimensions, keeping
    * downstream batches uniform (same contract as [[resizeStub]]).
    */
  def resizeImages(media: Dataset[MediaRecord], side: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .mapPartitions { it =>
        it.flatMap { r =>
          decodeOne(r.payload).map { bi =>
            val (w, h) = (bi.getWidth, bi.getHeight)
            val grid = Array.tabulate(side * side) { i =>
              val (gy, gx) = (i / side, i % side)
              val rgb = bi.getRGB((gx.toLong * w / side).toInt, (gy.toLong * h / side).toInt)
              ((299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
                114L * (rgb & 0xff)) / 1000L).toInt
            }
            (r.doc_id, side, grid)
          }
        }
      }
      .toDF("doc_id", "side", "pixels")
  }

  /** Decoded WAV features: format metadata + exact integer RMS sum. */
  case class WavFeatures(
      doc_id: Long,
      sample_rate: Int,
      channels: Int,
      bits: Int,
      n_frames: Long,
      sq_sum: Long, // Σ sample², exact — RMS = sqrt(sq_sum / n)
  )

  /** REAL WAV audio decode via the JDK's `javax.sound.sampled` — header
    * (rate/channels/width) plus an exact PCM16 sum of squares, the
    * integer core of RMS loudness. Non-WAV payloads drop, like
    * [[decodeImages]]. One frame buffer per record, streamed — payload
    * bytes never copy into a per-sample structure.
    */
  def decodeWavs(media: Dataset[MediaRecord]): Dataset[WavFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.payload))
          try {
            val f = in.getFormat
            val bytes = in.readAllBytes()
            var sq = 0L
            if (f.getSampleSizeInBits == 16) {
              val le = !f.isBigEndian
              var i = 0
              while (i + 1 < bytes.length) {
                val s =
                  if (le) ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort
                  else ((bytes(i) << 8) | (bytes(i + 1) & 0xff)).toShort
                sq += s.toLong * s.toLong
                i += 2
              }
            }
            Some(WavFeatures(r.doc_id, f.getSampleRate.toInt, f.getChannels,
              f.getSampleSizeInBits, in.getFrameLength, sq))
          } finally in.close()
        } catch { case scala.util.control.NonFatal(_) => None }
      }
    }
  }

  /** Frame-sampling stub: pick `n` evenly spaced bytes ("frames") from
    * the payload — the plumbing shape of video frame extraction.
    */
  def sampleFrames(media: Dataset[MediaRecord], n: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .mapPartitions { it =>
        it.flatMap { r =>
          val len = r.payload.length
          if (len == 0) Iterator.empty
          else (0 until n).iterator.map { i =>
            val pos = (i.toLong * len / n).toInt
            (r.doc_id, i, r.payload(pos) & 0xff)
          }
        }
      }
      .toDF("doc_id", "frame_idx", "frame_byte")
  }
}
