package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format coverage: the engine reads and writes every format
  * the built-in DataSource API ships (parquet is exercised everywhere
  * else; csv/json/orc round-trip here with explicit schemas — never
  * inference in the product path).
  */
class IoSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def roundTrip(fmt: String): Unit = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_io_$fmt").toString
    val src = Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    src.write.mode("overwrite").format(fmt).save(dir)
    val back = spark.read.schema(src.schema).format(fmt).load(dir)
    assert(back.count() === src.count())
    val a = src.orderBy("o_orderkey").collect()
    val b = back.orderBy("o_orderkey").collect()
    assert(a.sameElements(b), s"$fmt round-trip altered rows")
  }

  test("csv round-trips with explicit schema")(roundTrip("csv"))
  test("json round-trips with explicit schema")(roundTrip("json"))
  test("orc round-trips with explicit schema")(roundTrip("orc"))

  test("formatRoundtrip: parquet, csv and json copies reduce to identical aggregates") {
    val rows = graft.io.Sources.formatRoundtrip(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSet === Set("parquet", "csv", "json", "orc"))
    // one truth: every format's aggregate row is identical
    assert(rows.map(t => (t._2, t._3, t._4, t._5, t._6)).toSet.size === 1)
    assert(rows.head._2 > 0)
  }

  test("compaction: 32 small files collapse to 1, rows and values intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    val src = Tables.events(spark, "/root/testdata/sf0.001")
    src.repartition(32).write.parquet(dir)
    val before = new java.io.File(dir).listFiles.count(_.getName.endsWith(".parquet"))
    assert(before > 16) // genuinely fragmented
    val (rows, files) = graft.io.Maintenance.compactParquet(spark, dir, 1000000L)
    assert(rows === src.count())
    assert(files === 1)
    assert(spark.read.parquet(dir).count() === rows)
  }

  test("parquet schema evolution: mergeSchema unions columns across batches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    Seq((1L, "a")).toDF("id", "v1").write.parquet(s"$dir/b=0")
    Seq((2L, 3.5)).toDF("id", "v2").write.parquet(s"$dir/b=1")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq === Seq("b", "id", "v1", "v2"))
    val rows = merged.orderBy("id").collect()
    assert(rows(0).getAs[String]("v1") === "a" && rows(0).isNullAt(rows(0).fieldIndex("v2")))
    assert(rows(1).getAs[Double]("v2") === 3.5 && rows(1).isNullAt(rows(1).fieldIndex("v1")))
  }

  /** Every string→string map held anywhere in the reader/writer object
    * graph, merged — finds the `extraOptions` CaseInsensitiveMap without
    * naming the private field, so the test survives a field rename while
    * still failing if an option is dropped or a key misspelled.
    */
  private def heldOptions(obj: AnyRef): Map[String, String] = {
    def fields(c: Class[_]): Seq[java.lang.reflect.Field] =
      if (c == null) Nil else c.getDeclaredFields.toSeq ++ fields(c.getSuperclass)
    fields(obj.getClass).flatMap { f =>
      f.setAccessible(true)
      f.get(obj) match {
        case m: scala.collection.Map[_, _] =>
          m.toSeq.collect { case (k: String, v: String) => (k.toLowerCase, v) }
        case _ => Nil
      }
    }.toMap
  }

  // The broker itself is unreachable here (and the connector jar is not on
  // the test classpath), but every failure mode that is OURS — a dropped
  // option, a misspelled key, a default not applied — lives in the
  // constructed reader/writer and is assertable without connecting.
  test("kafka source plumbing: subscribe/offsets/throttle options all land") {
    val r = graft.io.Sources.kafkaReader(
      spark, "broker1:9092,broker2:9092", "events",
      startingOffsets = "earliest", maxOffsetsPerTrigger = Some(50000L))
    val opts = heldOptions(r)
    assert(opts.get("kafka.bootstrap.servers") === Some("broker1:9092,broker2:9092"))
    assert(opts.get("subscribe") === Some("events"))
    assert(opts.get("startingoffsets") === Some("earliest"))
    assert(opts.get("maxoffsetspertrigger") === Some("50000"))
  }

  test("kafka source plumbing: no throttle option unless asked") {
    val opts = heldOptions(graft.io.Sources.kafkaReader(spark, "b:9092", "t"))
    assert(opts.get("startingoffsets") === Some("latest"))
    assert(!opts.contains("maxoffsetspertrigger"))
  }

  test("kafka sink plumbing: topic/acks/checkpoint options all land") {
    val stream = spark.readStream.format("rate").load()
    for (acks <- Seq("0", "1", "all")) {
      val w = graft.io.Sinks.kafkaWriter(stream, "b:9092", "out", "/tmp/cp", acks)
      val opts = heldOptions(w)
      assert(opts.get("kafka.bootstrap.servers") === Some("b:9092"))
      assert(opts.get("topic") === Some("out"))
      assert(opts.get("kafka.acks") === Some(acks))
      assert(opts.get("checkpointlocation") === Some("/tmp/cp"))
    }
  }

  test("kafka sink plumbing: payload collapses to a single json value column") {
    import spark.implicits._
    // the exact projection kafkaWriter hands the connector, on a batch
    // frame where the content is collectable — a column-name mistake here
    // would silently produce an unreadable topic
    val df = Seq((7L, "a", 1.5)).toDF("id", "name", "score")
    val payload = graft.io.Sinks.jsonPayload(df)
    assert(payload.columns.toSeq === Seq("value"))
    assert(payload.head().getString(0) === """{"id":7,"name":"a","score":1.5}""")
    // and the streaming writer really wraps with the same projection:
    // the Dataset it holds must already be the 1-column value shape
    val w = graft.io.Sinks.kafkaWriter(
      spark.readStream.format("rate").load(), "b:9092", "out", "/tmp/cp")
    def fields(c: Class[_]): Seq[java.lang.reflect.Field] =
      if (c == null) Nil else c.getDeclaredFields.toSeq ++ fields(c.getSuperclass)
    val wrapped = fields(w.getClass).flatMap { f =>
      f.setAccessible(true)
      f.get(w) match {
        case d: org.apache.spark.sql.Dataset[_] => Some(d)
        case _ => None
      }
    }
    assert(wrapped.nonEmpty, "no Dataset field found on DataStreamWriter")
    assert(wrapped.head.columns.toSeq === Seq("value"))
  }

  test("binaryFile source: media files on disk decode identically to the parquet-column path") {
    // the media pipeline stores payloads as binary COLUMNS; a real crawl
    // lands them as FILES first. This drives Spark's binaryFile source —
    // glob filtering, recursive lookup, content+length columns — and
    // pins that the file route feeds the SAME decoder to the SAME
    // features as the column route.
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr, lit}
    import graft.ext.Multimodal
    val docs = (0L until 20L).toDF("doc_id")
    val recs = Multimodal.synthesizeImages(docs).collect()
    val dir = java.nio.file.Files.createTempDirectory("graft_binfiles")
    val sub = java.nio.file.Files.createDirectory(dir.resolve("nested"))
    recs.foreach { r =>
      val ext = if (r.media_id % 2 == 0) "bmp" else "png"
      val target = (if (r.media_id % 5 == 0) sub else dir)
        .resolve(s"img_${r.media_id}.$ext")
      java.nio.file.Files.write(target, r.content)
    }
    val files = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(dir.toString)
    // length column matches the payload; every written file surfaces
    val byId = files.select("path", "length", "content").collect()
      .map { row =>
        val id = row.getString(0).replaceAll(".*img_(\\d+)\\..*", "$1").toLong
        id -> (row.getLong(1), row.getAs[Array[Byte]](2))
      }.toMap
    assert(byId.keySet === recs.map(_.media_id).toSet)
    recs.foreach { r =>
      assert(byId(r.media_id)._1 === r.content.length.toLong)
      assert(java.util.Arrays.equals(byId(r.media_id)._2, r.content))
    }
    // glob filter: only PNGs (odd ids at the top level + nested odd ids)
    val pngs = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.png")
      .load(dir.toString)
      .select("path").as[String].collect()
    assert(pngs.forall(_.endsWith(".png")))
    assert(pngs.length === recs.count(_.media_id % 2 == 1))
    // file route -> the SAME decode features as the column route
    val fromFiles = files.select(
      expr("cast(regexp_extract(path, 'img_(\\\\d+)\\\\.', 1) as bigint)").as("media_id"),
      col("content"),
      lit(0).as("meta_width"), lit(0).as("meta_height"))
      .as[Multimodal.ImageRecord]
    val fileFeatures = Multimodal.decodeImages(fromFiles)
      .select("media_id", "pixel_sum", "img_width", "img_height")
      .as[(Long, Option[Long], Option[Int], Option[Int])].collect().sortBy(_._1).toSeq
    val colFeatures = Multimodal.decodeImages(
      Multimodal.synthesizeImages(docs))
      .select("media_id", "pixel_sum", "img_width", "img_height")
      .as[(Long, Option[Long], Option[Int], Option[Int])].collect().sortBy(_._1).toSeq
    assert(fileFeatures === colFeatures)
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("kafka boundary: option surface is exhaustive — connector defaults not silently overridden") {
    // The reader must set EXACTLY the documented keys and nothing else:
    // the connector's own defaults are part of the contract we rely on
    // (failOnDataLoss=true fails the query on truncated/expired offsets
    // rather than silently skipping data; no consumer group.id, so Spark
    // derives a unique one per query; includeHeaders=false). A helper
    // that "helpfully" pre-set any of these would change production
    // failure semantics invisibly — this pin makes that a test failure.
    val opts = heldOptions(graft.io.Sources.kafkaReader(spark, "b:9092", "events"))
    assert(opts.keySet === Set("kafka.bootstrap.servers", "subscribe", "startingoffsets"))
    for (k <- Seq("failondataloss", "kafka.group.id", "groupidprefix",
        "includeheaders", "kafkaconsumer.polltimeoutms"))
      assert(!opts.contains(k), s"connector default `$k` must not be silently overridden")
    // and the same surface survives the REAL readStream→load() handoff
    // (the part reflection can't see): rebuild the reader against a
    // capture-instrumented DSv2 source carrying the same option shape
    // plus its own required `path`, and compare what arrives at the
    // provider
    val f = java.nio.file.Files.createTempFile("graft_capture", ".jsonl")
    java.nio.file.Files.writeString(f, "{\"k\":1}\n")
    val reader = spark.readStream.format(classOf[CaptureSourceProvider].getName)
      .option("path", f.toString)
    opts.foreach { case (k, v) => reader.option(k, v) }
    reader.load()
    val arrived = CaptureSourceProvider.last
      .map { case (k, v) => (k.toLowerCase, v) } - "path"
    assert(arrived === opts)
  }
}

/** Test-only capture instrumentation over the repo's real DSv2 replay
  * source: records the options `.load()` hands the provider, proving
  * option pass-through at the actual DataStreamReader boundary (the
  * same TableProvider handoff a Kafka connector gets).
  */
object CaptureSourceProvider {
  @volatile var last: Map[String, String] = Map.empty
}

class CaptureSourceProvider extends graft.io.ReplaySourceProvider {
  override def inferSchema(
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap)
      : org.apache.spark.sql.types.StructType = {
    import scala.jdk.CollectionConverters._
    CaptureSourceProvider.last = options.asCaseSensitiveMap().asScala.toMap
    super.inferSchema(options)
  }
}
