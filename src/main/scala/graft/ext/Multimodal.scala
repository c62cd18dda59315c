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
  )
}
