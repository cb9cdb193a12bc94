package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus per-partition decode / feature-extract / resize /
  * frame-sample operators.
  *
  * The Spark-side plumbing is real — schemas, partition-wise batch
  * processing (`mapPartitions` over a typed Dataset, the Scala analogue of
  * arrow-batched `mapInPandas`), deterministic outputs, tests. The codec
  * itself is a clearly-marked STUB (`decodeStub`): this container has no
  * image/audio libraries, so the "decode" is a deterministic fake over the
  * raw bytes. Swapping in a real codec changes ONE function and nothing
  * about the distributed shape.
  *
  * Scale shape: payloads never shuffle — every operator here is a
  * projection or mapPartitions, so a 100 TB media corpus streams through
  * scan→transform→write with bytes touched exactly once per executor.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRecord(
      media_id: Long,
      doc_id: Long,
      modality: String, // image | audio | video
      content: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int,
      n_frames: Int)

  /** Features extracted per media row (by the stubbed decoder). */
  case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Long,
      mean_byte: Double,
      max_byte: Int,
      byte_entropy_proxy: Long)

  implicit val mediaEnc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
  implicit val featEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  /** Deterministic media table synthesized from the documents table: the
    * text bytes stand in for an encoded payload. Pure projection —
    * this is the declared-schema ingestion path a real pipeline would use
    * for (id, payload, metadata) parquet/tar shards.
    */
  def synthesizeMedia(documents: DataFrame): Dataset[MediaRecord] =
    documents.selectExpr(
      "doc_id as media_id",
      "doc_id",
      """case when doc_id % 3 = 0 then 'image'
        |     when doc_id % 3 = 1 then 'audio'
        |     else 'video' end as modality""".stripMargin,
      "encode(text, 'UTF-8') as content",
      "cast(64 + doc_id % 192 as int) as width",
      "cast(64 + doc_id % 128 as int) as height",
      "cast(case when doc_id % 3 = 1 then 16000 else 0 end as int) as sample_rate",
      "cast(case when doc_id % 3 = 2 then 10 + doc_id % 90 else 0 end as int) as n_frames")
      .as[MediaRecord]

  /** STUB DECODER — deterministic fake standing in for a real codec
    * (e.g. JPEG/PNG decode, PCM resample). A production build replaces
    * exactly this function body with the library call; everything around
    * it (batching, schema, partitioning) stays as-is.
    */
  private def decodeStub(content: Array[Byte]): (Double, Int, Long) = {
    // real impl: ImageIO.read(new ByteArrayInputStream(content)) ...
    var sum = 0L
    var max = 0
    var hash = 1125899906842597L
    var i = 0
    while (i < content.length) {
      val b = content(i) & 0xff
      sum += b
      if (b > max) max = b
      hash = hash * 31 + b
      i += 1
    }
    val mean = if (content.length == 0) 0.0 else sum.toDouble / content.length
    (mean, max, hash)
  }

  /** Partition-wise feature extraction: one pass over each partition's
    * rows, payload bytes touched once, output fully typed.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] =
    media.mapPartitions { rows =>
      rows.map { r =>
        // null payload (missing media) decodes as empty — a real codec
        // path must be total, not NPE on the first absent object
        val bytes = if (r.content == null) Array.empty[Byte] else r.content
        val (mean, max, hash) = decodeStub(bytes)
        MediaFeatures(r.media_id, r.modality, bytes.length.toLong, mean, max, hash)
      }
    }

  /** "Resize": metadata transform + payload truncation to the target byte
    * budget (stub for a real re-encode). Shape: pure mapPartitions.
    */
  def resize(media: Dataset[MediaRecord], maxBytes: Int): Dataset[MediaRecord] =
    media.mapPartitions { rows =>
      rows.map { r =>
        if (r.content == null || r.content.length <= maxBytes) r
        else r.copy(
          content = java.util.Arrays.copyOf(r.content, maxBytes),
          width = math.max(1, r.width / 2),
          height = math.max(1, r.height / 2))
      }
    }

  /** Exact dedup of binary payloads by content digest: the media twin of
    * [[Dedup.exact]]. Only the 32-char digest shuffles — a 100 TB media
    * corpus dedups by moving hashes, never bytes.
    */
  def mediaDedup(media: Dataset[MediaRecord]): DataFrame =
    media.toDF()
      .select(md5(col("content")).as("content_hash"),
        col("media_id"), col("modality"))
      .groupBy(col("content_hash"))
      .agg(
        min(col("media_id")).as("keeper_media_id"),
        count(lit(1)).as("n_copies"))

  /** Frame sampling for video rows: every `stride`-th frame index becomes
    * a row — the explode is declarative, so Catalyst can pipeline it into
    * the scan; non-video rows produce nothing.
    */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int = 7): DataFrame =
    media.toDF()
      .filter(col("modality") === "video" && col("n_frames") > 0)
      .selectExpr("media_id", "doc_id", "n_frames",
        s"explode(sequence(0L, cast(n_frames - 1 as bigint), ${stride}L)) as frame_idx")
}
