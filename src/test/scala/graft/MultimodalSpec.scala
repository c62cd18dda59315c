package graft

import graft.ext.Multimodal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "hello world", "en", "srcA", 11L),
    (2L, "", "en", "srcB", 0L),
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("media table carries binary payload + typed metadata") {
    val m = Multimodal.asMediaTable(docs)
    assert(m.schema("payload").dataType == BinaryType)
    val r = m.filter(col("doc_id") === 1L).head()
    assert(r.getAs[Long]("n_bytes") == 11L)
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") == "hello world")
    assert(r.getAs[String]("media_type") == "media/srcA")
  }

  test("feature extraction is deterministic and handles empty payloads") {
    val f1 = Multimodal.extractFeatures(Multimodal.asMediaTable(docs))
      .orderBy("doc_id").collect()
    val f2 = Multimodal.extractFeatures(Multimodal.asMediaTable(docs))
      .orderBy("doc_id").collect()
    assert(f1.sameElements(f2))
    val empty = f1.find(_.getLong(0) == 2L).get
    assert(empty.getAs[Long]("checksum") == 0L)
    val nonEmpty = f1.find(_.getLong(0) == 1L).get
    assert(nonEmpty.getAs[Int]("width") >= 64 && nonEmpty.getAs[Int]("height") >= 64)
  }

  test("resize emits the exact target byte budget and is deterministic") {
    val media = Multimodal.asMediaTable(docs)
    val r = Multimodal.resize(media, w = 4, h = 2).collect()
      .map(row => row.getAs[Long]("doc_id") -> row).toMap
    for ((_, row) <- r) {
      assert(row.getAs[Long]("n_bytes") == 4L * 2 * 3)
      assert(row.getAs[Array[Byte]]("payload").length == 24)
    }
    // empty payload resizes to all-zero bytes, not a crash
    assert(r(2L).getAs[Array[Byte]]("payload").forall(_ == 0))
    val again = Multimodal.resize(media, 4, 2).collect()
      .map(row => row.getAs[Long]("doc_id") -> row.getAs[Array[Byte]]("payload").toSeq)
      .toMap
    assert(again(1L) == r(1L).getAs[Array[Byte]]("payload").toSeq)
  }

  test("planted PNGs are genuine and decode to the planted dimensions") {
    val feats = Multimodal.extractFeatures(Multimodal.asImageTable(docs))
      .orderBy("doc_id").collect()
    for (r <- feats) {
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("media_type") == "image/png")
      assert(r.getAs[Int]("width") == 16 + (id % 48).toInt)
      assert(r.getAs[Int]("height") == 16 + (id % 31).toInt)
      assert(r.getAs[Int]("channels") == 3)
    }
    // the payload really is a PNG stream (magic bytes), not a fake
    val png = Multimodal.asImageTable(docs).filter(col("doc_id") === 1L)
      .head().getAs[Array[Byte]]("payload")
    assert((png(0) & 0xFF) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    // decoded-pixel checksum is deterministic across runs
    val again = Multimodal.extractFeatures(Multimodal.asImageTable(docs))
      .orderBy("doc_id").collect()
    assert(feats.map(_.getAs[Long]("checksum")).sameElements(
      again.map(_.getAs[Long]("checksum"))))
  }

  test("image resize decode-scale-encodes to a real PNG of the target size") {
    val resized = Multimodal.resize(Multimodal.asImageTable(docs), w = 8, h = 6)
    // re-extract features from the resized output: it must decode as 8x6
    val feats = Multimodal.extractFeatures(
        resized.withColumn("n_bytes", col("n_bytes")))
      .orderBy("doc_id").collect()
    for (r <- feats) {
      assert(r.getAs[Int]("width") == 8)
      assert(r.getAs[Int]("height") == 6)
      assert(r.getAs[Int]("channels") == 3)
    }
  }

  test("planted WAV decodes through the JDK audio codec to closed-form values") {
    val feats = Multimodal.extractAudioFeatures(Multimodal.asAudioTable(docs))
      .orderBy("doc_id").collect()
    assert(feats.nonEmpty)
    for (r <- feats) {
      val id = r.getAs[Long]("doc_id")
      val expRate = (id % 3) match { case 0 => 8000; case 1 => 16000; case _ => 22050 }
      val expN = 64 + (id % 937)
      val expEnergy = (0L until expN).map(i =>
        math.abs(((id * 2654435761L + i * 40503L) % 65536L) - 32768L)).sum
      assert(r.getAs[Int]("sample_rate") == expRate)
      assert(r.getAs[Int]("channels") == 1)
      assert(r.getAs[Int]("bits") == 16)
      assert(r.getAs[Long]("n_samples") == expN)
      assert(r.getAs[Long]("duration_ms") == expN * 1000L / expRate)
      assert(r.getAs[Long]("energy") == expEnergy)
    }
  }

  test("video frame sampling decodes real animated-GIF frames") {
    // doc_id 7 → width 15, height 15, 11 frames; every 3rd → idx 0,3,6,9.
    // Frame f has ((7 + f) % 15) * 15 white pixels — values only
    // recoverable through a genuine GIF container parse + frame decode.
    val docs = Seq((7L, "irrelevant", "en", "srcA", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val video = Multimodal.asVideoTable(docs).collect()
    assert(video.head.getAs[String]("media_type") == "video/gif")
    val payload = video.head.getAs[Array[Byte]]("payload")
    // genuine GIF container: magic bytes GIF89a/GIF87a
    assert(new String(payload.take(3), "US-ASCII") == "GIF")
    val frames = Multimodal
      .sampleFrames(Multimodal.asVideoTable(docs), everyN = 3)
      .collect()
    assert(frames.map(_.getAs[Int]("frame_idx")).sorted.toSeq == Seq(0, 3, 6, 9))
    assert(frames.forall(_.getAs[Int]("width") == 15))
    assert(frames.forall(_.getAs[Int]("height") == 15))
    for (r <- frames) {
      val f = r.getAs[Int]("frame_idx")
      assert(r.getAs[Long]("white_px") == ((7 + f) % 15) * 15L,
        s"frame $f decoded pixel count")
    }
  }

  test("patchGrid crops ragged edges, sums exactly, skips undecodable payloads") {
    def png(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = Seq(
      // 9x17 at p=8: 1 col x 2 rows = 2 patches; col 8 and row 16 crop
      (1L, "image/png", png(9, 17, (x, y) => (x << 16) | (y << 8) | 7)),
      // smaller than a patch on either axis: zero patches
      (2L, "image/png", png(7, 40, (_, _) => 0)),
      // not an image: skipped entirely
      (3L, "audio/wav", Array[Byte](1, 2, 3)),
    ).toDF("doc_id", "media_type", "payload")
    val out = Multimodal.patchGrid(media, p = 8)
      .orderBy("doc_id", "patch_row", "patch_col")
      .as[(Long, Int, Int, Long, Long, Long)].collect().toSeq
    // patch (0,0): x 0..7, y 0..7 → r = sum x*64 = 28*8... r sums x over
    // 8 rows: (0+..+7)*8 = 224; g sums y likewise = 224; b = 7*64 = 448
    // patch (1,0): x 0..7, y 8..15 → g = (8+..+15)*8 = 736
    assert(out == Seq(
      (1L, 0, 0, 224L, 224L, 448L),
      (1L, 1, 0, 224L, 736L, 448L)), s"got $out")
  }

  test("raw media files ingest via binaryFile and decode like the fixtures") {
    import spark.implicits._
    // land REAL PNG files (same generator as the parquet fixture) plus a
    // decoy the glob must prune at listing time
    val dir = java.nio.file.Files.createTempDirectory("rawmedia").toString
    val ids = Seq(3L, 7L, 11L)
    val planted = Multimodal.asImageTable(ids.toDF("doc_id"))
      .select("doc_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    planted.foreach { case (id, bytes) =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, s"img_$id.png"), bytes)
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "notes.txt"), "decoy".getBytes)
    val ingested = Multimodal.fromBinaryFiles(
      graft.sources.Lake.readBinaryFiles(spark, dir, Some("*.png")))
    // listing-time pruning: the decoy never reaches the frame
    assert(ingested.count() == 3)
    // doc_id from the file-name digits; type from the extension; n_bytes
    // from file METADATA (no decode)
    assert(ingested.select("doc_id").as[Long].collect().sorted.toSeq == ids)
    assert(ingested.select("media_type").distinct().as[String].head()
      == "image/png")
    // the ingested bytes decode to EXACTLY the fixture-path features
    val viaFiles = Multimodal.extractFeatures(ingested)
      .select("doc_id", "width", "height", "checksum")
      .collect().map(_.toString).sorted.toSeq
    val viaFixture = Multimodal.extractFeatures(
      Multimodal.asImageTable(ids.toDF("doc_id")))
      .select("doc_id", "width", "height", "checksum")
      .collect().map(_.toString).sorted.toSeq
    assert(viaFiles == viaFixture)
  }

  test("streaming media ingestion drains exactly-once and re-drains no-op") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("mediastream").toString
    val landing = s"$root/landing"; new java.io.File(landing).mkdirs()
    val table = s"$root/table"; val ckpt = s"$root/ckpt"
    def land(ids: Seq[Long]): Unit =
      Multimodal.asImageTable(ids.toDF("doc_id"))
        .select("doc_id", "payload").collect()
        .foreach(r => java.nio.file.Files.write(
          java.nio.file.Paths.get(landing, s"img_${r.getLong(0)}.png"),
          r.getAs[Array[Byte]](1)))
    land(Seq(1L, 2L))
    java.nio.file.Files.write( // decoy: pruned at LISTING, never ingested
      java.nio.file.Paths.get(landing, "junk.txt"), "x".getBytes)
    graft.stream.Ingest.runMediaPipeline(spark, landing, "*.png", table, ckpt)
    def ids = spark.read.parquet(table).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L))
    // re-drain with nothing new: the checkpoint's seen-files log makes it
    // a no-op (exactly-once), then a late file flows through incrementally
    graft.stream.Ingest.runMediaPipeline(spark, landing, "*.png", table, ckpt)
    assert(ids == Seq(1L, 2L))
    land(Seq(5L))
    graft.stream.Ingest.runMediaPipeline(spark, landing, "*.png", table, ckpt)
    assert(ids == Seq(1L, 2L, 5L))
    // ingested payloads decode identically to the fixture path
    val feats = Multimodal.extractFeatures(spark.read.parquet(table))
      .select("doc_id", "width", "height", "checksum")
      .collect().map(_.toString).sorted.toSeq
    val want = Multimodal.extractFeatures(
      Multimodal.asImageTable(Seq(1L, 2L, 5L).toDF("doc_id")))
      .select("doc_id", "width", "height", "checksum")
      .collect().map(_.toString).sorted.toSeq
    assert(feats == want)
  }
}
