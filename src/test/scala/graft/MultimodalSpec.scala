package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs = Seq(
    (0L, "aaaa bbbb cccc"), // image (0 % 3)
    (1L, "dddd eeee"),      // audio
    (2L, "ffff gggg hhhh")  // video, n_frames = 10 + 2 = 12
  ).toDF("doc_id", "text")

  test("synthesizeMedia assigns modality, payload and typed metadata") {
    val m = Multimodal.synthesizeMedia(docs).collect().map(r => r.media_id -> r).toMap
    assert(m(0L).modality === "image")
    assert(m(1L).modality === "audio")
    assert(m(2L).modality === "video")
    assert(new String(m(0L).content, "UTF-8") === "aaaa bbbb cccc")
    assert(m(1L).sample_rate === 16000)
    assert(m(2L).n_frames === 12)
  }

  test("extractFeatures computes deterministic byte statistics per partition") {
    val feats = Multimodal.extractFeatures(Multimodal.synthesizeMedia(docs))
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(0L).n_bytes === 14L)
    assert(feats(0L).max_byte === 'c'.toInt)
    // mean over "aaaa bbbb cccc" = (4*97 + 4*98 + 4*99 + 2*32) / 14
    assert(math.abs(feats(0L).mean_byte - (4 * 97 + 4 * 98 + 4 * 99 + 2 * 32) / 14.0) < 1e-12)
    // determinism: same input -> same hash
    val again = Multimodal.extractFeatures(Multimodal.synthesizeMedia(docs))
      .collect().map(f => f.media_id -> f.byte_entropy_proxy).toMap
    assert(feats.view.mapValues(_.byte_entropy_proxy).toMap === again)
  }

  test("extractRealFeatures dispatches every modality to its real codec") {
    val ids = Seq(0L, 1L, 2L, 3L, 4L, 5L).map(id => (id, "x"))
    val feats = Multimodal.extractRealFeatures(
      Multimodal.synthesizeRealMedia(ids.toDF("doc_id", "text")))
      .collect().map(f => f.media_id -> f).toMap
    assert(feats.values.forall(_.decode_ok))
    // spec-recomputed expectations, one per (modality, codec) arm
    def pixSum(id: Long, w: Int, h: Int): Long =
      (for { y <- 0 until h; x <- 0 until w } yield {
        val (r, g, b) = Multimodal.pixelChannels(id, x, y); (r + g + b).toLong
      }).sum
    def smpSum(id: Long): Long =
      (0 until Multimodal.specSamples(id)).map(i => Multimodal.sampleSpec(id, i).toLong).sum
    def graySum(id: Long): Long =
      (for {
        f <- 0 until Multimodal.specVideoFrames(id)
        y <- 0 until Multimodal.specVideoH(id)
        x <- 0 until Multimodal.specVideoW(id)
      } yield Multimodal.frameGray(id, f, x, y).toLong).sum
    assert(feats(0L).detected_format === "bmp") // image, even id
    assert(feats(0L).n_units === 4L * 3L)
    assert(feats(0L).unit_sum === pixSum(0L, 4, 3))
    assert(feats(3L).detected_format === "png") // image, odd id
    assert(feats(3L).unit_sum === pixSum(3L, 7, 6))
    assert(feats(4L).detected_format === "wav") // audio, even id
    assert(feats(4L).n_units === Multimodal.specSamples(4L).toLong)
    assert(feats(4L).unit_sum === smpSum(4L))
    assert(feats(1L).detected_format === "aiff") // audio, odd id
    assert(feats(1L).unit_sum === smpSum(1L))
    assert(feats(2L).detected_format === "gif") // video
    assert(feats(2L).n_units === Multimodal.specVideoFrames(2L).toLong)
    assert(feats(2L).unit_sum === graySum(2L))
    assert(feats(5L).detected_format === "gif")
    assert(feats(5L).unit_sum === graySum(5L))
  }

  test("extractRealFeatures degrades undecodable payloads to byte telemetry") {
    import Multimodal.MediaRecord
    val garbage = Array[Byte](1, 2, 3, 250.toByte)
    // valid RIFF magic, lying body: must fall back, not throw
    val lyingWav = "RIFFxxxxgarbage".getBytes("US-ASCII")
    val rows = Seq(
      MediaRecord(100L, 100L, "image", garbage, 0, 0, 0, 0),
      MediaRecord(101L, 101L, "audio", lyingWav, 0, 0, 0, 0),
      MediaRecord(102L, 102L, "video", null, 0, 0, 0, 0))
    val feats = Multimodal.extractRealFeatures(spark.createDataset(rows))
      .collect().map(f => f.media_id -> f).toMap
    assert(feats.values.forall(f => !f.decode_ok && f.detected_format == "opaque"))
    assert(feats(100L).n_units === 4L)
    assert(feats(100L).unit_sum === (1 + 2 + 3 + 250).toLong)
    assert(feats(101L).n_units === lyingWav.length.toLong)
    assert(feats(102L).n_units === 0L)
    assert(feats(102L).unit_sum === 0L)
  }

  test("resizeImages: NN half-scale round-trips; corrupt payloads flag, never throw") {
    import Multimodal.ImageRecord
    // decodable corpus leg: spec-recomputed expectation for one image
    val ids = Seq((0L, "x"), (3L, "x"))
    val r = Multimodal.resizeImages(
      Multimodal.synthesizeImages(ids.toDF("doc_id", "text")))
      .collect().map(f => f.media_id -> f).toMap
    // id 0: 4x3 -> 2x1; NN reads src (x*4/2, y*3/1) = (0,0),(2,0)
    assert(r(0L).resize_ok && r(0L).out_width === Some(2) && r(0L).out_height === Some(1))
    val expect0 = Seq((0, 0), (2, 0)).map { case (sx, sy) =>
      val (a, b, c) = Multimodal.pixelChannels(0L, sx, sy); (a + b + c).toLong
    }.sum
    assert(r(0L).pixel_sum === Some(expect0))
    // BI_RGB framing: 2 px/row -> 6 bytes + 2 pad, 1 row
    assert(r(0L).out_bytes === Some(54L + 8L))
    // PNG leg (odd id) resizes identically — the decode is codec-agnostic
    assert(r(3L).resize_ok && r(3L).out_width === Some(3)) // 7x6 -> 3x3
    // corrupt and null payloads surface as flagged rows
    val bad = Seq(
      ImageRecord(100L, Array[Byte](1, 2, 3), 4, 3),
      ImageRecord(101L, null, 4, 3))
    val rb = Multimodal.resizeImages(spark.createDataset(bad))
      .collect().map(f => f.media_id -> f).toMap
    assert(rb.values.forall(f => !f.resize_ok && f.pixel_sum.isEmpty))
  }

  test("resize truncates payload and halves dimensions only when oversized") {
    val resized = Multimodal.resize(Multimodal.synthesizeMedia(docs), maxBytes = 10)
      .collect().map(r => r.media_id -> r).toMap
    assert(resized(0L).content.length === 10)
    assert(resized(0L).width === (64 + 0) / 2)
    assert(resized(1L).content.length === 9) // under budget: untouched
    assert(resized(1L).width === 64 + 1)
  }

  test("sampleFrames emits every 7th frame index for video rows only") {
    val frames = Multimodal.sampleFrames(Multimodal.synthesizeMedia(docs))
      .select("media_id", "frame_idx").as[(Long, Long)].collect().sorted
    assert(frames.toSeq === Seq((2L, 0L), (2L, 7L))) // n_frames=12 -> 0, 7
  }

  test("media pipeline runs unchanged on a stream and matches batch bit-for-bit") {
    // the streaming-twin contract for the media family: synthesize →
    // resize → extractFeatures are mapPartitions/projections, so the SAME
    // library calls compile onto a streaming Dataset — the payload never
    // shuffles, so there is no state and no watermark to manage
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = Seq((0L, "aaaa bbbb cccc"), (1L, "dddd eeee"), (2L, "ffff gggg hhhh"))
    val ms = MemoryStream[(Long, String)]
    val streamed = Multimodal.extractFeatures(
      Multimodal.resize(
        Multimodal.synthesizeMedia(ms.toDS().toDF("doc_id", "text")), 10))
    val q = streamed.writeStream.format("memory").queryName("media_stream")
      .outputMode("append").start()
    try {
      ms.addData(rows)
      q.processAllAvailable()
      val stream = spark.table("media_stream").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3), r.getInt(4), r.getLong(5)))
        .sortBy(_._1).toSeq
      val batch = Multimodal.extractFeatures(
        Multimodal.resize(
          Multimodal.synthesizeMedia(rows.toDF("doc_id", "text")), 10))
        .collect()
        .map(f => (f.media_id, f.n_bytes, f.mean_byte, f.max_byte, f.byte_entropy_proxy))
        .sortBy(_._1).toSeq
      assert(stream === batch)
      assert(stream.forall(_._2 <= 10)) // the resize budget applied in-stream
    } finally q.stop()
  }

  test("codec legs run unchanged on a stream and match batch bit-for-bit") {
    // the real decode paths are stateless mapPartitions like the feature
    // chain, so the SAME library calls compile onto a streaming Dataset —
    // payloads decode where they arrive and never shuffle
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = Seq((0L, "a"), (1L, "b"), (7L, "c"), (12L, "d"))
    val ms = MemoryStream[(Long, String)]
    val sdf = ms.toDS().toDF("doc_id", "text")
    val audioQ = Multimodal.decodeAudio(Multimodal.synthesizeAudio(sdf))
      .writeStream.format("memory").queryName("audio_stream")
      .outputMode("append").start()
    val videoQ = Multimodal.decodeSampledFrames(Multimodal.synthesizeVideos(sdf))
      .writeStream.format("memory").queryName("video_stream")
      .outputMode("append").start()
    try {
      ms.addData(rows)
      audioQ.processAllAvailable()
      videoQ.processAllAvailable()
      val batchDf = rows.toDF("doc_id", "text")
      val audioBatch = Multimodal.decodeAudio(Multimodal.synthesizeAudio(batchDf))
        .collect().map(d => (d.media_id, d.sample_sum, d.weighted_sum)).sorted.toSeq
      val audioStream = spark.table("audio_stream")
        .selectExpr("media_id", "sample_sum", "weighted_sum")
        .as[(Long, Option[Long], Option[Long])].collect().sorted.toSeq
      assert(audioStream === audioBatch)
      val videoBatch = Multimodal.decodeSampledFrames(Multimodal.synthesizeVideos(batchDf))
        .collect().map(d => (d.media_id, d.frame_idx, d.pixel_sum)).sorted.toSeq
      val videoStream = spark.table("video_stream")
        .selectExpr("media_id", "frame_idx", "pixel_sum")
        .as[(Long, Option[Int], Option[Long])].collect().sorted.toSeq
      assert(videoStream === videoBatch)
    } finally { audioQ.stop(); videoQ.stop() }
  }

  test("decodeImages: real ImageIO round-trip matches the closed-form pixel spec") {
    val ids = Seq(0L, 1L, 7L, 12L, 499L)
    val docs = ids.map(id => (id, s"text $id")).toDF("doc_id", "text")
    val out = Multimodal.decodeImages(Multimodal.synthesizeImages(docs))
      .collect().map(d => d.media_id -> d).toMap
    assert(out.keySet === ids.toSet)
    ids.foreach { id =>
      val d = out(id)
      val w = (4 + id % 13).toInt
      val h = (3 + id % 11).toInt
      assert(d.decode_ok, s"id $id failed to decode")
      // even ids are hand-rolled BMP, odd ids JDK-encoded PNG — both
      // codecs must decode to the same spec pixels
      assert(d.detected_format === Some(if (id % 2 == 0) "bmp" else "png"))
      assert(d.img_width === Some(w) && d.img_height === Some(h))
      assert(d.meta_consistent === Some(true))
      // independent fold of the spec, bypassing both encoder and decoder
      var ps = 0L; var ws = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = Multimodal.pixelChannels(id, x, y)
        ps += r + g + b
        ws += (1L + x + w.toLong * y) * (r + 2L * g + 3L * b)
      }
      assert(d.pixel_sum === Some(ps), s"pixel_sum id $id")
      assert(d.weighted_sum === Some(ws), s"weighted_sum id $id")
    }
  }

  test("decodeImages: corrupt and null payloads surface as decode_ok=false rows") {
    import Multimodal.{ImageRecord, DecodedImage}
    val good = Multimodal.encodeBmp(5L, 6, 4)
    val truncated = java.util.Arrays.copyOf(good, 20) // header torn mid-info
    val garbage = Array.fill[Byte](64)(0x5a)
    // valid BMP magic, malformed header (absurd negative dimensions):
    // the JDK reader throws RuntimeExceptions here, not IOException —
    // must still surface as a row (the NonFatal catch), not kill the task
    val badHeader = java.util.Arrays.copyOf(good, good.length)
    badHeader(18) = 0xff.toByte; badHeader(19) = 0xff.toByte
    badHeader(20) = 0xff.toByte; badHeader(21) = 0xff.toByte // width = -1
    val recs = Seq(
      ImageRecord(1L, good, 6, 4),
      ImageRecord(2L, truncated, 6, 4),
      ImageRecord(3L, garbage, 6, 4),
      ImageRecord(4L, null, 6, 4),
      // decodes fine but the claimed metadata lies → consistency false,
      // not a decode failure
      ImageRecord(5L, good, 9, 9),
      ImageRecord(6L, badHeader, 6, 4))
    val out = Multimodal.decodeImages(spark.createDataset(recs))
      .collect().map(d => d.media_id -> d).toMap
    assert(out(1L).decode_ok && out(1L).meta_consistent === Some(true))
    Seq(2L, 3L, 4L, 6L).foreach { id =>
      val d = out(id)
      assert(!d.decode_ok, s"id $id should not decode")
      assert(d.detected_format.isEmpty && d.img_width.isEmpty &&
        d.pixel_sum.isEmpty && d.meta_consistent.isEmpty)
    }
    assert(out(5L).decode_ok && out(5L).meta_consistent === Some(false))
    assert(out(5L).pixel_sum === out(1L).pixel_sum)
  }

  test("decodeAudio: real WAV/AIFF round-trip matches the closed-form sample spec") {
    val ids = Seq(0L, 1L, 2L, 7L, 499L)
    val docs = ids.map(id => (id, s"text $id")).toDF("doc_id", "text")
    val out = Multimodal.decodeAudio(Multimodal.synthesizeAudio(docs))
      .collect().map(d => d.media_id -> d).toMap
    assert(out.keySet === ids.toSet)
    ids.foreach { id =>
      val d = out(id)
      val n = Multimodal.specSamples(id)
      assert(d.decode_ok, s"id $id failed to decode")
      // even ids are hand-rolled WAV (little-endian), odd ids JDK AIFF
      // (big-endian) — both containers must decode to the same samples
      assert(d.detected_format === Some(if (id % 2 == 0) "wav" else "aiff"))
      assert(d.sr_hz === Some(Multimodal.specRate(id)))
      assert(d.n_channels === Some(1) && d.n_samples === Some(n.toLong))
      assert(d.meta_consistent === Some(true))
      // independent fold of the spec, bypassing both encoder and decoder
      var sum = 0L; var wsum = 0L
      var mn = Int.MaxValue; var mx = Int.MinValue
      for (i <- 0 until n) {
        val s = Multimodal.sampleSpec(id, i)
        sum += s; wsum += (i + 1L) * s
        mn = math.min(mn, s); mx = math.max(mx, s)
      }
      assert(d.sample_sum === Some(sum), s"sample_sum id $id")
      assert(d.weighted_sum === Some(wsum), s"weighted_sum id $id")
      assert(d.min_sample === Some(mn) && d.max_sample === Some(mx))
    }
  }

  test("decodeAudio: corrupt, null and wrong-shape payloads surface as decode_ok=false") {
    import Multimodal.AudioRecord
    val good = Multimodal.encodeWav(4L, 54, 12000)
    val truncated = java.util.Arrays.copyOf(good, 30) // torn mid-header
    val garbage = Array.fill[Byte](64)(0x5a)
    // valid RIFF magic, data-chunk size lying past the payload end
    val badHeader = java.util.Arrays.copyOf(good, good.length)
    badHeader(40) = 0xff.toByte; badHeader(41) = 0xff.toByte
    badHeader(42) = 0xff.toByte; badHeader(43) = 0x7f.toByte
    // decodable but stereo/8-bit shapes must be rejected, not misfolded:
    // 8-bit mono WAV built by the JDK encoder itself
    val fmt8 = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val ais8 = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(Array.fill[Byte](16)(7)), fmt8, 16L)
    val bos8 = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais8, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos8)
    val recs = Seq(
      AudioRecord(1L, good, 12000, 54),
      AudioRecord(2L, truncated, 12000, 54),
      AudioRecord(3L, garbage, 12000, 54),
      AudioRecord(4L, null, 12000, 54),
      AudioRecord(5L, good, 16000, 99), // decodes fine; metadata lies
      AudioRecord(6L, bos8.toByteArray, 8000, 16),
      AudioRecord(7L, badHeader, 12000, 54))
    val out = Multimodal.decodeAudio(spark.createDataset(recs))
      .collect().map(d => d.media_id -> d).toMap
    assert(out(1L).decode_ok && out(1L).meta_consistent === Some(true))
    Seq(2L, 3L, 4L, 6L).foreach { id =>
      val d = out(id)
      assert(!d.decode_ok, s"id $id should not decode")
      assert(d.detected_format.isEmpty && d.sample_sum.isEmpty &&
        d.meta_consistent.isEmpty)
    }
    assert(out(5L).decode_ok && out(5L).meta_consistent === Some(false))
    assert(out(5L).sample_sum === out(1L).sample_sum)
    // the lying data-chunk size (id 7: valid RIFF magic, data-chunk size
    // pointing past the payload end) either fails or decodes exactly the
    // real frames — it must never fold bytes past the payload end
    if (out(7L).decode_ok) assert(out(7L).sample_sum === out(1L).sample_sum)
    else assert(out(7L).sample_sum.isEmpty)
  }

  test("decodeSampledFrames: real multi-frame GIF matches the closed-form frame spec") {
    val ids = Seq(0L, 1L, 5L, 12L, 499L)
    val docs = ids.map(id => (id, s"text $id")).toDF("doc_id", "text")
    val out = Multimodal.decodeSampledFrames(
      Multimodal.synthesizeVideos(docs), stride = 3)
      .collect().groupBy(_.media_id)
    assert(out.keySet === ids.toSet)
    ids.foreach { id =>
      val w = Multimodal.specVideoW(id)
      val h = Multimodal.specVideoH(id)
      val nf = Multimodal.specVideoFrames(id)
      val sampled = out(id).sortBy(_.frame_idx)
      // exactly the strided frame indices, nothing else
      assert(sampled.map(_.frame_idx.get).toSeq === (0 until nf by 3).toSeq)
      sampled.foreach { d =>
        assert(d.decode_ok && d.n_frames === Some(nf))
        assert(d.img_width === Some(w) && d.img_height === Some(h))
        assert(d.meta_consistent === Some(true))
        val f = d.frame_idx.get
        var ps = 0L; var ws = 0L
        for (y <- 0 until h; x <- 0 until w) {
          val g = Multimodal.frameGray(id, f, x, y)
          ps += g; ws += (1L + x + w.toLong * y) * g
        }
        assert(d.pixel_sum === Some(ps), s"pixel_sum id $id frame $f")
        assert(d.weighted_sum === Some(ws), s"weighted_sum id $id frame $f")
      }
    }
  }

  test("keyframes: energies re-derived from the closed-form spec; corrupt payloads drop out") {
    import Multimodal.VideoRecord
    val ids = Seq(0L, 7L, 123L)
    val docs = ids.map(id => (id, s"text $id")).toDF("doc_id", "text")
    val out = Multimodal.keyframes(Multimodal.synthesizeVideos(docs))
      .collect().groupBy(_.media_id)
    assert(out.keySet === ids.toSet)
    ids.foreach { id =>
      val w = Multimodal.specVideoW(id)
      val h = Multimodal.specVideoH(id)
      val nf = Multimodal.specVideoFrames(id)
      // reference selection straight from the pixel spec
      val want = (1 until nf).flatMap { f =>
        var e = 0L
        for (y <- 0 until h; x <- 0 until w)
          e += math.abs(Multimodal.frameGray(id, f, x, y) -
            Multimodal.frameGray(id, f - 1, x, y)).toLong
        if (e > 8L * w * h) Some(f -> e) else None
      }.toMap
      val got = out(id).sortBy(_.frame_idx)
      assert(got.head.frame_idx === 0 && got.head.energy.isEmpty)
      assert(got.tail.map(k => k.frame_idx -> k.energy.get).toMap === want)
      got.foreach(k => assert(k.n_frames === nf))
    }
    // corrupt/null payloads contribute no keyframe rows
    val bad = Seq(
      VideoRecord(90L, Array.fill[Byte](64)(0x5a), 7, 5, 6),
      VideoRecord(91L, null, 7, 5, 6),
      VideoRecord(92L, Multimodal.encodeGif(92L, 7, 5, 6), 7, 5, 6))
    val got2 = Multimodal.keyframes(spark.createDataset(bad)).collect().map(_.media_id).toSet
    assert(got2 === Set(92L))
  }

  test("decodeSampledFrames: corrupt and null payloads surface as one failed row") {
    import Multimodal.VideoRecord
    val good = Multimodal.encodeGif(3L, 7, 5, 6)
    val truncated = java.util.Arrays.copyOf(good, 40)
    val garbage = Array.fill[Byte](64)(0x5a)
    val recs = Seq(
      VideoRecord(1L, good, 7, 5, 6),
      VideoRecord(2L, truncated, 7, 5, 6),
      VideoRecord(3L, garbage, 7, 5, 6),
      VideoRecord(4L, null, 7, 5, 6),
      VideoRecord(5L, good, 9, 9, 6)) // decodes fine; metadata lies
    val out = Multimodal.decodeSampledFrames(spark.createDataset(recs), stride = 3)
      .collect().groupBy(_.media_id)
    assert(out(1L).forall(d => d.decode_ok && d.meta_consistent === Some(true)))
    assert(out(1L).map(_.frame_idx.get).sorted.toSeq === Seq(0, 3))
    Seq(2L, 3L, 4L).foreach { id =>
      assert(out(id).length === 1 && !out(id).head.decode_ok, s"id $id")
      assert(out(id).head.pixel_sum.isEmpty && out(id).head.n_frames.isEmpty)
    }
    assert(out(5L).forall(d => d.decode_ok && d.meta_consistent === Some(false)))
    assert(out(5L).map(_.pixel_sum) === out(1L).map(_.pixel_sum))
  }

  test("imagePhash/phashPairs: BMP/PNG twins hash identically; byte dedup cannot pair them; corrupt rows surface") {
    import Multimodal.ImageRecord
    import spark.implicits._
    val docs = Seq((0L, "x"), (1L, "y"), (7L, "z")).toDF("doc_id", "text")
    val twins = Multimodal.synthesizeImagePairs(docs)
    // zero shared payload bytes between a doc's two encodings...
    val byId = twins.collect().map(r => r.media_id -> r).toMap
    assert(byId.keySet === Set(0L, 1L, 2L, 3L, 14L, 15L))
    Seq(0L, 1L, 7L).foreach { d =>
      assert(!java.util.Arrays.equals(byId(2 * d).content, byId(2 * d + 1).content))
    }
    // ...but identical perceptual hashes
    val ph = Multimodal.imagePhash(twins).collect()
      .map(p => p.media_id -> p).toMap
    Seq(0L, 1L, 7L).foreach { d =>
      val (a, b) = (ph(2 * d), ph(2 * d + 1))
      assert(a.decode_ok && b.decode_ok)
      assert(Seq(a.band0, a.band1, a.band2, a.band3)
        === Seq(b.band0, b.band1, b.band2, b.band3), s"doc $d")
    }
    // the pair join recovers exactly the cross-codec twins at Hamming 0
    val pairs = Multimodal.phashPairs(twins).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    Seq(0L, 1L, 7L).foreach { d =>
      assert(pairs.contains((2 * d, 2 * d + 1, 0)), s"twin pair of doc $d")
    }
    // a corrupt payload surfaces as decode_ok=false and never pairs
    val corrupt = spark.createDataset(
      twins.collect().toSeq :+ ImageRecord(99L, Array[Byte](1, 2, 3), 4, 3))
    val ph2 = Multimodal.imagePhash(corrupt).collect()
      .map(p => p.media_id -> p).toMap
    assert(!ph2(99L).decode_ok && ph2(99L).band0.isEmpty)
    assert(!Multimodal.phashPairs(corrupt).collect()
      .exists(r => r.getLong(0) == 99L || r.getLong(1) == 99L))
  }
}
