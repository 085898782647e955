package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque BINARY
  * columns with typed metadata, processed in partition-local batches.
  *
  * The decode step is a STUB (this environment ships no image/audio
  * codecs): `FakeCodec` derives deterministic pseudo-metadata and
  * pseudo-features from the bytes. Everything around it — the schema,
  * the typed Dataset, the batched mapPartitions shape (the Scala analog
  * of a Pandas-UDF `mapInPandas`: decode amortized over a batch, one
  * output row per input row), and the partition-preserving layout — is
  * real and is what a production codec would drop into.
  */
object Multimodal {

  /** An opaque media row: bytes + declared type. */
  case class MediaRecord(doc_id: Long, media_type: String, media: Array[Byte])

  /** Decoded metadata + a small feature vector. */
  case class DecodedMedia(
      doc_id: Long, media_type: String, byte_len: Int,
      width: Int, height: Int, duration_ms: Int,
      feature: Array[Float])

  /** Deterministic stand-in for a real decoder. A production pipeline
    * replaces `decode` with e.g. an image library call; signature and
    * batch usage stay identical.
    */
  object FakeCodec {
    def decode(r: MediaRecord): DecodedMedia = {
      var h = 1125899906842597L // deterministic FNV-ish fold of the bytes
      var i = 0
      while (i < r.media.length) { h = h * 31 + (r.media(i) & 0xff); i += 1 }
      def field(salt: Int, mod: Int): Int = {
        val x = h ^ (salt.toLong * 0x9e3779b97f4a7c15L)
        (((x % mod) + mod) % mod).toInt
      }
      val isVideoOrAudio = r.media_type == "video" || r.media_type == "audio"
      DecodedMedia(
        doc_id = r.doc_id, media_type = r.media_type,
        byte_len = r.media.length,
        width = if (r.media_type == "audio") 0 else 64 + field(1, 1856),
        height = if (r.media_type == "audio") 0 else 64 + field(2, 1016),
        duration_ms = if (isVideoOrAudio) 1000 + field(3, 600000) else 0,
        feature = Array.tabulate(8)(j => field(10 + j, 1000) / 1000.0f))
    }
  }

  /** Batched decode over partitions — the `mapInPandas` shape: group the
    * partition iterator into batches (a real codec amortizes setup per
    * batch), decode, re-flatten. No shuffle; partitioning and row order
    * within partitions are preserved.
    */
  def decodeAll(media: Dataset[MediaRecord], batchSize: Int = 64): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch => batch.map(FakeCodec.decode) }
    }
  }

  /** Resize (stub): recompute target metadata preserving aspect ratio —
    * the longest side shrinks to `maxSide`, never upscaling. A real
    * implementation would transform pixels in the same mapPartitions
    * shape as decodeAll; the metadata contract is what downstream
    * consumers depend on.
    */
  def resize(decoded: Dataset[DecodedMedia], maxSide: Int): Dataset[DecodedMedia] = {
    import decoded.sparkSession.implicits._
    decoded.map { d =>
      val longest = math.max(d.width, d.height)
      if (longest <= maxSide || longest == 0) d
      else {
        val scale = maxSide.toDouble / longest
        d.copy(width = math.max(1, math.round(d.width * scale).toInt),
               height = math.max(1, math.round(d.height * scale).toInt))
      }
    }
  }

  /** Frame sampling for video-typed rows: every `stride`-th fixed-size
    * byte window as one "frame" (a real implementation samples decoded
    * frames; the slicing/explode plumbing is identical).
    */
  def sampleFrames(media: Dataset[MediaRecord], frameBytes: Int = 16,
                   stride: Int = 4): DataFrame = {
    val df = media.toDF()
    df.filter(col("media_type") === "video" &&
              length(col("media")) >= frameBytes) // too short ⇒ zero frames
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), greatest(lit(0),
            floor((length(col("media")) - frameBytes) / (frameBytes * stride))
              .cast("int"))),
          i => substring(col("media"), (i * frameBytes * stride + 1).cast("int"), lit(frameBytes))))
          .as(Seq("frame_idx", "frame")))
  }

  /** Synthesize a media table from any text corpus (for tests/benches):
    * bytes = utf8(text), type cycles by id. */
  def synthesize(docs: DataFrame, idCol: String, textCol: String)
                (implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
        col(idCol).cast("long").as("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col(idCol) % 3 + 1).cast("int")).as("media_type"),
        encode(col(textCol), "UTF-8").as("media"))
      .as[MediaRecord]
  }
}
