package graft.ext

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (tier C): media payloads as opaque `binary`
  * columns with typed metadata, plus a batched decode/feature-extract stage.
  *
  * The decode step is STUBBED (no image/audio libs in this container) with a
  * deterministic fake that derives "decoded" properties from the bytes — the
  * Spark-side plumbing is real: binary columns flow through parquet-friendly
  * schemas, and the extract stage is `mapPartitions` over typed rows
  * (partition-batched, the Scala analogue of `mapInPandas` batch processing:
  * amortized per-batch setup, no per-row interpreter round trip).
  *
  * Scale notes: media blobs dominate row size → `media` carries its own
  * byte-length metadata so planners can filter/route without touching the
  * blob; feature extraction is a narrow map (no shuffle) and should run
  * after any filtering aggregation pushdowns.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("n_bytes", LongType, nullable = false),
  ))

  /** Build a media table: the document text bytes stand in for an opaque
    * media payload (deterministic; real pipelines read image/audio files).
    */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      concat(lit("media/"), col("source")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      octet_length(col("text")).cast("long").as("n_bytes"),
    )

  final case class MediaFeatures(doc_id: Long, media_type: String,
      n_bytes: Long, width: Int, height: Int, channels: Int, checksum: Long)

  /** STUB decode: a real implementation would decode image/audio bytes
    * here (e.g. via javax.imageio / ffmpeg bindings). The fake derives
    * stable pseudo-dimensions from the payload so tests are deterministic.
    * Runs per-partition: one "decoder" instantiation per batch, mirroring
    * the mapInPandas batch shape.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val out = media.select("doc_id", "media_type", "payload", "n_bytes")
      .as[(Long, String, Array[Byte], Long)]
      .mapPartitions { batch =>
        // per-partition decoder setup would go here (load codec once)
        batch.map { case (id, mt, payload, nBytes) =>
          val bytes = if (payload == null) Array.emptyByteArray else payload
          var sum = 0L
          var i = 0
          while (i < bytes.length) { sum = sum * 31 + (bytes(i) & 0xFF); i += 1 }
          // fake "decoded" dims, stable functions of content
          val width = 64 + (math.abs(sum) % 1024).toInt
          val height = 64 + (math.abs(sum / 7) % 1024).toInt
          MediaFeatures(id, mt, nBytes, width, height, 3, sum)
        }
      }
    out.toDF()
  }

  final case class ResizedMedia(doc_id: Long, media_type: String,
      width: Int, height: Int, n_bytes: Long, payload: Array[Byte])

  /** STUB resize: binary in → binary out with the target dimensions'
    * byte budget (w*h*3). A real codec would decode-scale-encode; the
    * stub resamples source bytes at a fixed stride so output is a
    * deterministic function of (payload, w, h). The plumbing — binary
    * column in, binary column out, per-partition batching — is the real
    * shape of a distributed image-resize stage.
    */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media_type", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        val outLen = w * h * 3
        batch.map { case (id, mt, payload) =>
          val src = if (payload == null) Array.emptyByteArray else payload
          val out = new Array[Byte](outLen)
          if (src.nonEmpty) {
            var i = 0
            while (i < outLen) {
              out(i) = src(((i.toLong * src.length) / outLen).toInt)
              i += 1
            }
          }
          ResizedMedia(id, mt, w, h, outLen.toLong, out)
        }
      }
      .toDF()
  }

  final case class Frame(doc_id: Long, frame_idx: Int, n_bytes: Int,
      checksum: Long)

  /** STUB frame sampling: treat the payload as fixed-size frames and emit
    * every Nth one — the 1→N video→frames explode. Iterator-based
    * flatMap keeps memory bounded per partition (frames stream out, the
    * "video" is never materialized as a frame list), which is what lets a
    * multi-GB video row pass through a 4 GB executor.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, everyN: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "payload")
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val src = if (payload == null) Array.emptyByteArray else payload
        val nFrames = src.length / frameBytes
        Iterator.range(0, nFrames).filter(_ % everyN == 0).map { f =>
          var sum = 0L
          var i = f * frameBytes
          val end = i + frameBytes
          while (i < end) { sum = sum * 31 + (src(i) & 0xFF); i += 1 }
          Frame(id, f, frameBytes, sum)
        }
      }
      .toDF()
  }

  val all: Seq[QueryDef] = Seq(
    // Binary-column metadata — oracled: byte lengths and md5 content
    // hashes agree across engines.
    QueryDef(
      "mm_binary_meta",
      (sp, dir) =>
        asMediaTable(Tables.documents(sp, dir))
          .select(col("doc_id"), col("media_type"), col("n_bytes"),
            md5(col("payload")).as("content_md5"))
          .orderBy("doc_id"),
      Some(
        """SELECT doc_id, 'media/' || source AS media_type,
          |       strlen(text) AS n_bytes, md5(text) AS content_md5
          |FROM documents ORDER BY doc_id""".stripMargin),
    ),
    // Stubbed decode + feature extraction (mapPartitions path).
    QueryDef(
      "mm_features",
      (sp, dir) =>
        extractFeatures(asMediaTable(Tables.documents(sp, dir)))
          .orderBy("doc_id"),
      None, // decode is stubbed; plumbing verified by ScalaTest
    ),
    QueryDef(
      "mm_frame_sample",
      (sp, dir) =>
        sampleFrames(asMediaTable(Tables.documents(sp, dir)),
          frameBytes = 64, everyN = 4)
          .groupBy("doc_id")
          .agg(count(lit(1)).cast("long").as("n_frames"),
            min("checksum").as("min_checksum"))
          .orderBy("doc_id"),
      None, // stub codec; frame math pinned by MultimodalSpec
    ),
  )
}
