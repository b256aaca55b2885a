package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata for an opaque media blob. */
case class MediaMeta(width: Int, height: Int, sampleRate: Int, format: String)

/** A media row: opaque binary content + typed metadata (SURVEY §2.7). */
case class MediaFile(media_id: Long, kind: String, content: Array[Byte], meta: MediaMeta)

/** Extracted features for one media row. */
case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                         content_hash: String, feature: Array[Float], n_frames: Int)

/** Multimodal-column plumbing (SURVEY §2.7): image/audio/video as opaque
  * `binary` columns with typed metadata, decoded and featurized in
  * partition-local batches.
  *
  * The DECODE STEP IS A DETERMINISTIC STUB — this container has no
  * image/audio codecs, so [[MultimodalStub.decode]] fabricates
  * "pixels" by an md5 chain over the bytes. Everything around it is the
  * real Spark shape a production decode would use:
  *  - schema: `content BINARY` + `meta STRUCT<…>` survive parquet
  *    round-trips and shuffles;
  *  - execution: `mapPartitions` over a typed Dataset, processing rows in
  *    fixed-size batches (the JVM mirror of `mapInPandas`' Arrow batch
  *    contract — swap the stub for a JNI/codec call per batch);
  *  - partitioning: batch size and partition count are independent, so a
  *    1000-executor run decodes `files/partitions` blobs per task with no
  *    driver involvement.
  */
object Multimodal {

  val FeatureDim = 16
  val BatchSize = 64

  /** Fabricate a media table from the documents table: deterministic
    * binary content (text bytes), kind by doc_id mod 3, synthetic meta. */
  def ingest(docs: DataFrame): Dataset[MediaFile] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"), col("n_chars")).as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaFile(id, kind, text.getBytes(StandardCharsets.UTF_8),
          MediaMeta(width = (nChars % 640).toInt, height = (nChars % 480).toInt,
            sampleRate = if (kind == "audio") 16000 else 0, format = kind match {
              case "image" => "png"; case "audio" => "wav"; case _ => "mp4"
            }))
      }
  }

  /** Batched decode + featurize via mapPartitions — the real execution
    * shape with the stub codec inside. */
  def featurize(media: Dataset[MediaFile]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // fixed-size batches: a real codec amortizes per-batch setup
      // (model load, Arrow buffer, JNI handle) exactly here
      rows.grouped(BatchSize).flatMap { batch =>
        MultimodalStub.decodeBatch(batch)
      }
    }
  }

  /** Resize stage (images/video): same batched mapPartitions contract as
    * [[featurize]]; the stub scales content proportionally to the pixel
    * change and rewrites meta — a real build swaps in the codec's scaler
    * without touching the plumbing. Audio rows pass through untouched. */
  def resize(media: Dataset[MediaFile], width: Int, height: Int): Dataset[MediaFile] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap { batch =>
        batch.map(m => if (m.kind == "audio") m else MultimodalStub.resize(m, width, height))
      }
    }
  }

  /** Frame-sampling stage (video): one output row per sampled frame,
    * every `stride`-th pseudo-frame — the generator-shaped stage (rows
    * out > rows in) a real video pipeline runs before per-frame
    * featurization. Non-video rows yield no frames. */
  def frameSample(media: Dataset[MediaFile], stride: Int): Dataset[MediaFile] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      if (m.kind != "video") Iterator.empty
      else {
        val nFrames = 1 + m.content.length / 100
        (0 until nFrames by stride).iterator.map(f => MultimodalStub.frame(m, f))
      }
    }
  }

  /** End-to-end: documents → binary media → per-kind feature summary.
    * Aggregates only plumbing-derived integers, so the result is
    * deterministic and testable without real codecs. */
  def mediaSummary(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    featurize(ingest(docs))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("n_frames").cast("long")).as("total_frames"))
      .orderBy("kind")
  }

  /** Binary-content dedup THROUGH the media path: unique blobs per kind,
    * counted from the `content_hash` the batched decoder emits. The hash
    * of the binary content equals md5 of the source text bytes, so
    * DuckDB mirrors it without decoding. */
  def mediaDedup(docs: DataFrame): DataFrame =
    featurize(ingest(docs))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_files"),
        countDistinct(col("content_hash")).as("n_unique"))
      .orderBy("kind")

  type Q = (SparkSession, String) => DataFrame
  val queries: Map[String, Q] = Map(
    "mm_summary" -> ((s, d) => mediaSummary(Tables.documents(s, d))),
    "mm_dedup"   -> ((s, d) => mediaDedup(Tables.documents(s, d))),
  )

  /** `mm_summary` runs the full binary pipeline (ingest → batched decode
    * → per-kind agg), but every aggregated value is arithmetic over the
    * source text (UTF-8 byte length, doc_id mod 3), so DuckDB can derive
    * the identical result without decoding — the §2.7 plumbing becomes
    * driver-checkable end to end. */
  val oracle: Map[String, String] = Map(
    "mm_summary" ->
      """SELECT kind, count(*) AS n_files,
        |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        |  CAST(sum(CASE WHEN kind = 'video' THEN 1 + n_bytes // 100
        |                WHEN kind = 'image' THEN 1 ELSE 0 END) AS BIGINT) AS total_frames
        |FROM (
        |  SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |         ELSE 'video' END AS kind,
        |    octet_length(encode(text)) AS n_bytes
        |  FROM documents) m
        |GROUP BY kind ORDER BY kind""".stripMargin,
    "mm_dedup" ->
      """SELECT kind, count(*) AS n_files,
        |  count(DISTINCT md5(text)) AS n_unique
        |FROM (
        |  SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |         ELSE 'video' END AS kind, text
        |  FROM documents) m
        |GROUP BY kind ORDER BY kind""".stripMargin,
  )
}

/** The clearly-marked fake codec. A production build replaces exactly
  * this object with real decoders (libjpeg/ffmpeg via JNI, or a Python
  * worker via Arrow); signatures and batch shape stay unchanged. */
object MultimodalStub {

  private def md5(bytes: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("MD5").digest(bytes)

  /** STUB decode: deterministic pseudo-"frames"/features from content
    * bytes. Real implementation: decode image/audio, run the feature
    * extractor per batch. */
  def decodeBatch(batch: Seq[MediaFile]): Seq[MediaFeatures] =
    batch.map { m =>
      val digest = md5(m.content)
      val hashHex = digest.map(b => f"$b%02x").mkString
      // pseudo feature vector: chained md5, 16 floats in [0,1)
      val feature = new Array[Float](Multimodal.FeatureDim)
      var cur = digest
      var i = 0
      while (i < Multimodal.FeatureDim) {
        feature(i) = ((cur(0) & 0xff) * 256 + (cur(1) & 0xff)) / 65536.0f
        cur = md5(cur)
        i += 1
      }
      // pseudo frame count: video samples 1 frame per 100 bytes
      val frames = m.kind match {
        case "video" => 1 + m.content.length / 100
        case "image" => 1
        case _       => 0
      }
      MediaFeatures(m.media_id, m.kind, m.content.length.toLong, hashHex, feature, frames)
    }

  /** STUB resize: deterministically truncate/extend content to the
    * pixel-proportional size and rewrite meta. Real implementation:
    * decode, scale, re-encode. */
  def resize(m: MediaFile, width: Int, height: Int): MediaFile = {
    // empty blob stays empty (indexing into zero-length content would
    // throw); meta still reflects the requested dimensions
    if (m.content.isEmpty)
      return m.copy(meta = m.meta.copy(width = width, height = height))
    val oldPixels = math.max(1, m.meta.width * m.meta.height)
    val newLen = math.max(1,
      (m.content.length.toLong * (width * height) / oldPixels).toInt)
    val out = new Array[Byte](newLen)
    var i = 0
    while (i < newLen) { out(i) = m.content(i % m.content.length); i += 1 }
    m.copy(content = out, meta = m.meta.copy(width = width, height = height))
  }

  /** STUB frame extraction: a deterministic slice keyed by frame index.
    * Real implementation: seek + decode the frame. */
  def frame(m: MediaFile, idx: Int): MediaFile = {
    val len = math.min(100, m.content.length)
    val start = (idx * 100) % math.max(1, m.content.length)
    val out = new Array[Byte](len)
    var i = 0
    while (i < len) { out(i) = m.content((start + i) % m.content.length); i += 1 }
    m.copy(media_id = m.media_id * 100000 + idx, kind = "frame", content = out,
      meta = m.meta.copy(format = "frame"))
  }
}
