package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus per-partition decode / feature-extract / resize /
  * frame-sample operators.
  *
  * The Spark-side plumbing is real — schemas, partition-wise batch
  * processing (`mapPartitions` over a typed Dataset, the Scala analogue of
  * arrow-batched `mapInPandas`), deterministic outputs, tests. Two codec
  * tiers:
  *  - the IMAGE leg is a REAL decode ([[decodeImages]]): JDK
  *    `javax.imageio` reads genuine BMP payloads on executors, gated
  *    end-to-end against a closed-form pixel oracle;
  *  - audio/video decode remains a clearly-marked STUB (`decodeStub`) —
  *    this container ships no PCM/video libraries, so that "decode" is a
  *    deterministic fake over the raw bytes. Swapping in a real codec
  *    changes ONE function and nothing about the distributed shape, as
  *    the image leg demonstrates.
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

  // ---------------------------------------------------------------------
  // Real codec path: BMP encode + javax.imageio decode (JDK-only, no
  // external libraries). Unlike decodeStub above — which stands in for
  // codecs this container genuinely lacks — the JDK ships PNG/BMP/GIF
  // readers, so the image leg of the pipeline runs a REAL
  // bytes→BufferedImage decode on executors. The gate closes the loop
  // end-to-end: pixels are a closed-form function of (media_id, x, y)
  // that the SQL oracle recomputes, so a bug anywhere in the encoder,
  // the ImageIO round-trip, or the feature fold (channel order,
  // bottom-up row flip, row padding, off-by-one) flips a hash mismatch.
  // ---------------------------------------------------------------------

  /** An encoded image payload + the metadata the encoder claims. */
  case class ImageRecord(
      media_id: Long,
      content: Array[Byte],
      meta_width: Int,
      meta_height: Int)

  /** PNG twin of [[encodeBmp]]: the same [[pixelChannels]] spec rendered
    * through the JDK's own PNG ENCODER (`ImageIO.write`), so the corpus
    * exercises two genuinely different codecs — a hand-rolled
    * uncompressed format and a real DEFLATE-compressed one — against one
    * pixel oracle. Encoded bytes are never compared (PNG byte streams
    * may differ across encoder versions); only decoded pixels are, and
    * those are codec-independent.
    */
  private[graft] def encodePng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = pixelChannels(id, x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode result: NULL-propagating on undecodable payloads
    * (`decode_ok = false`) — a corrupt object must surface as a row, not
    * kill the scan. `weighted_sum` is position- and channel-weighted so
    * orientation (bottom-up BMP rows) and channel-order (BGR file order
    * vs RGB in memory) mistakes change the value even though the plain
    * `pixel_sum` wouldn't notice.
    */
  case class DecodedImage(
      media_id: Long,
      decode_ok: Boolean,
      detected_format: Option[String],
      img_width: Option[Int],
      img_height: Option[Int],
      pixel_sum: Option[Long],
      weighted_sum: Option[Long],
      meta_consistent: Option[Boolean])

  implicit val imageEnc: Encoder[ImageRecord] = Encoders.product[ImageRecord]
  implicit val decodedEnc: Encoder[DecodedImage] = Encoders.product[DecodedImage]

  /** Closed-form pixel spec — the contract both the Scala encoder and the
    * SQL oracle implement independently. Channels are linear in
    * (id, x, y) mod 256; x,y are image coordinates (y = 0 at the top).
    */
  private[graft] def pixelChannels(id: Long, x: Int, y: Int): (Int, Int, Int) = (
    ((id + 3L * x + 7L * y) % 256L).toInt,
    ((2L * id + 5L * x + 11L * y) % 256L).toInt,
    ((3L * id + 13L * x + y) % 256L).toInt)

  /** Hand-rolled 24-bit uncompressed (BI_RGB) BMP: 14-byte file header,
    * 40-byte info header, bottom-up rows of B,G,R triplets padded to
    * 4-byte boundaries. Written against the format spec, decoded by the
    * JDK's independent reader — the pair cross-checks itself.
    */
  private[graft] def encodeBmp(id: Long, w: Int, h: Int): Array[Byte] = {
    val rowBytes = w * 3
    val pad = (4 - rowBytes % 4) % 4
    val imgSize = (rowBytes + pad) * h
    val fileSize = 54 + imgSize
    val buf = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putShort(0).putShort(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(imgSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var j = 0
    while (j < h) {
      val y = h - 1 - j // positive height ⇒ rows stored bottom-up
      var x = 0
      while (x < w) {
        val (r, g, b) = pixelChannels(id, x, y)
        buf.put(b.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var p = 0
      while (p < pad) { buf.put(0.toByte); p += 1 }
      j += 1
    }
    buf.array()
  }

  /** Deterministic real-BMP corpus from the documents table: dimensions
    * are doc_id-derived (so the oracle knows them), pixels follow
    * [[pixelChannels]]. Pure mapPartitions — payload construction is
    * executor-side; nothing but doc_ids leaves the scan.
    */
  def synthesizeImages(documents: DataFrame): Dataset[ImageRecord] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      // negative ids would need floor-mod agreement across three
      // languages; the corpus contract (TESTDATA.md) is nonnegative ids
      .where(col("doc_id").isNotNull && col("doc_id") >= 0L)
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        // once per partition, not per row: keeps the PNG encoder off
        // executor-local tmp files (ImageIO's default spills streams)
        javax.imageio.ImageIO.setUseCache(false)
        ids.map { id =>
          val w = (4 + id % 13).toInt
          val h = (3 + id % 11).toInt
          // alternate codecs by id: even → hand-rolled BMP, odd → the
          // JDK PNG encoder; the decode side detects the format from
          // magic bytes, so both real paths are gate-covered
          val bytes =
            if (id % 2 == 0) encodeBmp(id, w, h) else encodePng(id, w, h)
          ImageRecord(id, bytes, w, h)
        }
      }
  }

  /** REAL decode: `javax.imageio.ImageIO.read` on each payload, then one
    * pass over the `BufferedImage` folding exact integer features. Scale
    * shape: mapPartitions projection, payloads touched once and never
    * shuffled; `setUseCache(false)` keeps ImageIO off executor-local tmp
    * files (its default spills every stream to disk).
    */
  def decodeImages(images: Dataset[ImageRecord]): Dataset[DecodedImage] =
    images.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { rec =>
        val img =
          if (rec.content == null) null
          else
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(rec.content))
            // NonFatal, not just IOException: the JDK readers throw
            // IllegalArgument/ArrayIndexOutOfBounds/NegativeArraySize
            // on malformed headers (valid magic, garbage dimensions) —
            // a corrupt object must surface as a row, not kill the scan
            catch { case scala.util.control.NonFatal(_) => null }
        if (img == null)
          DecodedImage(rec.media_id, decode_ok = false, None, None, None, None, None, None)
        else {
          // container sniff from magic bytes — decode-independent, so a
          // mislabeled payload is detectable even when it decodes
          val fmt = rec.content match {
            case c if c.length >= 2 && c(0) == 'B'.toByte && c(1) == 'M'.toByte => Some("bmp")
            case c if c.length >= 4 && (c(0) & 0xff) == 0x89 &&
              c(1) == 'P'.toByte && c(2) == 'N'.toByte && c(3) == 'G'.toByte => Some("png")
            case _ => Some("other")
          }
          val w = img.getWidth
          val h = img.getHeight
          var ps = 0L
          var ws = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val r = (rgb >> 16) & 0xff
              val g = (rgb >> 8) & 0xff
              val b = rgb & 0xff
              ps += r + g + b
              ws += (1L + x + w.toLong * y) * (r + 2L * g + 3L * b)
              x += 1
            }
            y += 1
          }
          DecodedImage(rec.media_id, decode_ok = true, fmt, Some(w), Some(h),
            Some(ps), Some(ws),
            Some(w == rec.meta_width && h == rec.meta_height))
        }
      }
    }
}
