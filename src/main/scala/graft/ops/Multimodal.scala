package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling (SURVEY.md §7.4): media as opaque `binary`
  * payloads with typed metadata, decoded/feature-extracted via typed
  * partition-wise map.
  *
  * The decode step is a clearly-marked deterministic STUB — this
  * container ships no image/audio codecs, so `decodeStub` stands in for
  * the real codec call. Everything around it is the real Spark plumbing a
  * production pipeline needs: binary schema, case-class encoders, a
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

  /** STUB decoder: deterministic fake of a codec's header parse. A real
    * deployment replaces the body with e.g. an image library call —
    * the signature (bytes in, flat features out) and the partition-wise
    * execution shape stay identical.
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
