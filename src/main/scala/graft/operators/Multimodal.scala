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

/** 64-bit perceptual signature of one image, as four 16-bit bands
  * (`mm_phash`): bands 0-2 hold the top-3-bit quantization of the 16
  * signature pixels, band 3 the pixel-vs-mean comparison bits. */
case class ImageSig(media_id: Long, b0: Long, b1: Long, b2: Long, b3: Long)

/** Extracted features for one media row. `width`/`height`/`lum` are READ
  * FROM THE DECODED IMAGE for image rows (zero for other kinds);
  * `n_bytes` is the decoded payload size (w·h·3 for RGB images, blob
  * length otherwise). */
case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                         content_hash: String, feature: Array[Float], n_frames: Int,
                         width: Int, height: Int, lum: Long)

/** Multimodal-column plumbing (SURVEY §2.7): image/audio/video as opaque
  * `binary` columns with typed metadata, decoded and featurized in
  * partition-local batches.
  *
  * ALL THREE kinds decode for REAL: ingest encodes genuine PNG bytes
  * (JDK `javax.imageio`), genuine RIFF/WAVE PCM bytes (JDK
  * `javax.sound.sampled`), and — r6 — genuine motion-PNG video
  * containers ([[VideoCodec]]: an MPNG header wrapping N standalone PNG
  * frames, per-frame-decoded with the real image codec, MJPEG-style; the
  * JDK ships no video codec, so the CONTAINER is bespoke but the decode
  * work is real). Width/height/luminance, frame-count/amplitude, and
  * per-frame video statistics all come from actually decoded pixels and
  * samples; the driver's oracle re-derives them arithmetically because
  * the encoded values are deterministic functions of the source
  * document. The one remaining stand-in is the feature EXTRACTOR
  * ([[MultimodalStub.pseudoFeature]]). The surrounding Spark shape is
  * production faithful for all kinds:
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

  /** Fabricate a media table from the documents table: kind by doc_id
    * mod 3. IMAGE rows carry REAL PNG bytes ([[ImageCodec.encodePng]]):
    * dimensions (8 + n_chars%24) × (8 + n_chars%16), the first 16 pixels
    * carrying the md5 digest of the text (so distinct texts yield
    * distinct images — binary dedup semantics match text dedup), the
    * rest a constant gray n_chars%256. AUDIO rows carry REAL WAV bytes
    * ([[AudioCodec.encodeWav]]): 16-bit PCM mono at [[AudioCodec.Rate]]
    * Hz, 256 + n_chars%512 sample frames, the first 16 samples encoding
    * the text digest (same injectivity argument as images), the rest a
    * constant amplitude derived from n_chars. VIDEO rows carry REAL
    * MPNG containers ([[VideoCodec.encodeMpng]]): 2 + n_chars%6 genuine
    * PNG frames at the image dimensions, frame f's constant gray level
    * (n_chars + 7f) % 256 with the digest in its first 16 pixels —
    * every decoded statistic for ALL kinds is an arithmetic function of
    * (n_chars, md5(text)) that DuckDB re-derives without a codec. */
  def ingest(docs: DataFrame): Dataset[MediaFile] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"), col("n_chars")).as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val bytes = text.getBytes(StandardCharsets.UTF_8)
        (id % 3) match {
          case 0 =>
            val w = 8 + (nChars % 24).toInt
            val h = 8 + (nChars % 16).toInt
            val png = ImageCodec.encodePng(w, h,
              MessageDigest.getInstance("MD5").digest(bytes), (nChars % 256).toInt)
            MediaFile(id, "image", png, MediaMeta(w, h, 0, "png"))
          case 1 =>
            val n = 256 + (nChars % 512).toInt
            val wav = AudioCodec.encodeWav(n,
              MessageDigest.getInstance("MD5").digest(bytes), (nChars % 128).toInt)
            MediaFile(id, "audio", wav, MediaMeta(0, 0, AudioCodec.Rate, "wav"))
          case _ =>
            val w = 8 + (nChars % 24).toInt
            val h = 8 + (nChars % 16).toInt
            val nF = 2 + (nChars % 6).toInt
            val dig = MessageDigest.getInstance("MD5").digest(bytes)
            val mpng = VideoCodec.encodeMpng((0 until nF).map(f =>
              ImageCodec.encodePng(w, h, dig, ((nChars + 7 * f) % 256).toInt)))
            MediaFile(id, "video", mpng, MediaMeta(w, h, 0, "mpng"))
        }
      }
  }

  /** Batched decode + featurize via mapPartitions — every kind through
    * its REAL codec. The feature vectors come from `extractor` (default:
    * the md5 pseudo-embedding) — swapping in a real model touches ONLY
    * that argument, never the batch plumbing ([[FeatureExtractor]]). */
  def featurize(media: Dataset[MediaFile],
                extractor: FeatureExtractor = Md5Extractor): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // fixed-size batches: a real codec amortizes per-batch setup
      // (model load, Arrow buffer, JNI handle) exactly here
      rows.grouped(BatchSize).flatMap { batch =>
        decodeBatch(batch, extractor)
      }
    }
  }

  /** Per-batch decode dispatch: `image` → [[ImageCodec.decode]] (real
    * pixels: width/height/luminance read from the decoded PNG, n_bytes =
    * decoded RGB payload), `audio` → [[AudioCodec.decode]] (real PCM:
    * n_frames = decoded sample-frame count, n_bytes = decoded PCM
    * payload, `lum` carries the |amplitude| sum — the signal-energy
    * statistic for audio, as luminance is for images), `video` →
    * [[VideoCodec.decode]] (real per-frame PNG decodes: frame count,
    * dimensions, summed RGB payload and luminance). The feature vector is a
    * deterministic md5-chain pseudo-embedding for all kinds (a real
    * build swaps the extractor, not the batch plumbing). */
  def decodeBatch(batch: Seq[MediaFile],
                  extractor: FeatureExtractor = Md5Extractor): Seq[MediaFeatures] = {
    val features = extractor.extractBatch(batch)
    require(features.size == batch.size,
      s"extractor returned ${features.size} vectors for ${batch.size} inputs")
    batch.zip(features).map { case (m, feature) =>
      require(feature.length == FeatureDim,
        s"extractor vector dim ${feature.length} != FeatureDim $FeatureDim (media_id=${m.media_id})")
      val hashHex = MessageDigest.getInstance("MD5").digest(m.content)
        .map(b => f"$b%02x").mkString
      m.kind match {
        case "image" | "frame" => // sampled video frames are standalone PNGs
          val (w, h, lum) = ImageCodec.decode(m.content, m.media_id)
          MediaFeatures(m.media_id, m.kind, w.toLong * h * 3, hashHex, feature,
            n_frames = 1, width = w, height = h, lum = lum)
        case "audio" =>
          val (frames, absSum) = AudioCodec.decode(m.content, m.media_id)
          MediaFeatures(m.media_id, m.kind, frames * 2L, hashHex, feature,
            n_frames = frames, width = 0, height = 0, lum = absSum)
        case _ =>
          val (nF, w, h, rgbBytes, lum) = VideoCodec.decode(m.content, m.media_id)
          MediaFeatures(m.media_id, m.kind, rgbBytes, hashHex, feature,
            n_frames = nF, width = w, height = h, lum = lum)
      }
    }
  }

  /** Resize stage: same batched mapPartitions contract as [[featurize]].
    * Images run a REAL decode → Graphics2D rescale → PNG re-encode
    * ([[ImageCodec.resize]]); video keeps the stub byte-scaler; audio
    * rows pass through untouched. */
  def resize(media: Dataset[MediaFile], width: Int, height: Int): Dataset[MediaFile] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap { batch =>
        batch.map {
          case m if m.kind == "audio" => m
          case m if m.kind == "image" =>
            m.copy(content = ImageCodec.resize(m.content, width, height, m.media_id),
              meta = m.meta.copy(width = width, height = height))
          case m => // video: REAL per-frame decode → rescale → re-encode
            m.copy(content = VideoCodec.encodeMpng(VideoCodec.frames(m.content, m.media_id)
                .map(f => ImageCodec.resize(f, width, height, m.media_id))),
              meta = m.meta.copy(width = width, height = height))
        }
      }
    }
  }

  /** Frame-sampling stage (video): one output row per sampled frame,
    * every `stride`-th REAL frame extracted from the MPNG container —
    * the generator-shaped stage (rows out > rows in) a video pipeline
    * runs before per-frame featurization. Each emitted row carries a
    * genuine standalone PNG, decodable by every downstream image stage.
    * Non-video rows yield no frames. */
  def frameSample(media: Dataset[MediaFile], stride: Int): Dataset[MediaFile] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      if (m.kind != "video") Iterator.empty
      else VideoCodec.frames(m.content, m.media_id).zipWithIndex.iterator
        .collect { case (png, f) if f % stride == 0 =>
          MediaFile(m.media_id * 100000 + f, "frame", png,
            m.meta.copy(format = "png"))
        }
    }
  }

  /** The media table staged ON DISK (binary-column parquet) through the
    * fixture layer: written once from [[ingest]], then read back as a
    * typed Dataset. The gated queries start here, so what they measure
    * is the production shape — scan stored blobs + decode — not
    * per-query media synthesis (PNG/WAV ENCODING is fixture-build cost,
    * paid once per test-data generation). */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaFile] = {
    import s.implicits._
    // "mm_media3": layout version key — r6 replaced the raw-bytes video
    // stub with real MPNG containers; r16 split the staging into a
    // corpus-derived FILE COUNT. The r6 layout was one parquet file
    // (one row group), and a single row group is one scan task no
    // matter the session's cores — so EVERY mm key's decode (the
    // family's whole cost: real PNG/WAV/MPNG codec work per row) ran
    // serially in one task before its first exchange. Production media
    // storage is many objects — file count IS the decode parallelism —
    // so the staging mirrors it: floored at [[MediaFileFloor]] (decode
    // is CPU-bound; the floor is the parallelism a single box can
    // bring to bear), growing with the corpus like the WARC staging's
    // file dial.
    val dir = graft.sources.Fixtures.dirFor("mm_media3", d, "documents")
    if (!graft.sources.Fixtures.ready(dir)) {
      val docs = graft.Tables.documents(s, d)
      val nFiles = math.max(MediaFileFloor, (docs.count() / 50000L).toInt)
      ingest(docs).repartition(nFiles).write.mode("overwrite").parquet(dir)
    }
    s.read.parquet(dir).as[MediaFile]
  }

  /** Media-staging file-count floor — see [[mediaTable]]. */
  val MediaFileFloor = 16

  /** End-to-end: stored binary media → batched decode → per-kind feature
    * summary. For images and audio every aggregated value (pixel count,
    * decoded payload bytes, luminance sum, PCM frame count, amplitude
    * sum) is measured from the ACTUAL decoded PNG/WAV; the oracle
    * re-derives them arithmetically because the encoding is a
    * deterministic function of the source document. */
  def mediaSummary(media: Dataset[MediaFile]): DataFrame = {
    featurize(media)
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("n_frames").cast("long")).as("total_frames"),
        // pixels across every decoded frame (images: n_frames = 1)
        sum(col("width").cast("long") * col("height") * col("n_frames")).as("total_pixels"),
        sum(col("lum")).as("total_lum"))
      .orderBy("kind")
  }

  /** Binary-content dedup THROUGH the media path: unique blobs per kind,
    * counted from the `content_hash` the batched decoder emits. Every
    * kind's encoding embeds the full text digest (first 16 pixels /
    * samples / every video frame's head pixels), making text→blob
    * injective on digests — distinct COUNTS match DuckDB's
    * count(DISTINCT md5(text)) exactly even though the hash values
    * differ. */
  def mediaDedup(media: Dataset[MediaFile]): DataFrame =
    featurize(media)
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_files"),
        countDistinct(col("content_hash")).as("n_unique"))
      .orderBy("kind")

  /** The video frame-sampling stage under the driver gate (`mm_frames`):
    * every 2nd REAL frame from each MPNG container, individually
    * re-decoded through the image branch of [[decodeBatch]] — sampled
    * count, pixel total, and luminance total are only derivable if both
    * the container parse AND each standalone frame decode are real. */
  def frameSummary(media: Dataset[MediaFile]): DataFrame =
    featurize(frameSample(media, stride = 2))
      .agg(count(lit(1)).as("n_sampled"),
        sum(col("width").cast("long") * col("height")).as("total_px"),
        sum(col("lum")).as("total_lum"))

  /** The RESIZE stage under the driver gate (`mm_resize`): every stored
    * blob through [[resize]] — real Graphics2D rescale + PNG re-encode
    * for images and every video frame, audio pass-through — then
    * re-DECODED by [[featurize]] and aggregated per kind. The gated
    * stats (file/frame counts, decoded payload bytes, pixel totals) are
    * all arithmetic consequences of the target dimensions, so DuckDB
    * derives them without an image library; their hash-match proves the
    * rescaled PNGs are REAL (a broken re-encode fails the decode loudly,
    * wrong dims shift every byte/pixel total). Luminance is excluded by
    * design: interpolated pixel values are the codec's own, not
    * derivable arithmetic. */
  val ResizeW = 9
  val ResizeH = 7

  def resizeSummary(media: Dataset[MediaFile]): DataFrame =
    featurize(resize(media, ResizeW, ResizeH))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("n_frames").cast("long")).as("total_frames"),
        sum(col("width").cast("long") * col("height") * col("n_frames")).as("total_pixels"))
      .orderBy("kind")

  /** Audio decimation stride for `mm_downsample`. */
  val DownFactor = 2

  /** The audio DOWNSAMPLE stage (`mm_downsample`): every stored WAV
    * through a REAL decode → every-2nd-sample decimation → PCM
    * re-encode ([[AudioCodec.decimate]]); image/video rows pass through
    * untouched (the mirror of `mm_resize`, whose audio passes through).
    * The whole set then re-DECODES via [[featurize]] and aggregates per
    * kind — the audio row's frame count, payload bytes, and |amplitude|
    * sum are arithmetic consequences of which sample indices survive
    * (even indices keep 8 of the 16 digest samples + ceil(n/2)−8
    * constants), so a hash-match proves the decimated WAV is real. */
  def downsample(media: Dataset[MediaFile], factor: Int): Dataset[MediaFile] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap { batch =>
        batch.map {
          case m if m.kind == "audio" =>
            m.copy(content = AudioCodec.decimate(m.content, factor, m.media_id))
          case m => m
        }
      }
    }
  }

  def downsampleSummary(media: Dataset[MediaFile]): DataFrame =
    mediaSummary(downsample(media, DownFactor))

  /** COMPOSED MULTIMODAL PIPELINE (`pipe_mm`) — the §2.7b counterpart
    * for the binary side: every stored blob through BOTH transform
    * stages chained — decimation then resize (audio decimates and
    * passes resize; images/video resize and pass decimation) — then
    * re-decoded and aggregated per kind. The point is COMPOSITION:
    * each stage's output must be a fully valid input to the next —
    * re-encoded WAV/PNG bytes re-decode — so the gated counts, bytes,
    * frames, and pixel totals are arithmetic consequences of BOTH
    * transforms applied in order (audio frames halve then pass
    * through; image/video pixels land at the resize target). Stats
    * that depend on interpolated pixel VALUES stay out, the mm_resize
    * rule. */
  def pipelineSummary(media: Dataset[MediaFile]): DataFrame =
    featurize(resize(downsample(media, DownFactor), ResizeW, ResizeH))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("n_frames").cast("long")).as("total_frames"),
        sum(col("width").cast("long") * col("height") * col("n_frames")).as("total_pixels"))
      .orderBy("kind")

  /** RAW-FILE multimodal ingestion (`src_binary`) — Spark's built-in
    * `binaryFile` source, the standard way a media corpus actually
    * arrives (one blob per object/file, identity in the path): the
    * fixture stages every blob as its own `<kind>_<id>.bin` file, the
    * query reads the DIRECTORY back via `format("binaryFile")`, parses
    * kind/id from the path, runs the REAL decode, and aggregates —
    * the same gate as `mm_summary`, so a hash-match proves the blobs
    * survive the file round-trip byte-exactly AND the binaryFile
    * reader config is right. At 100 TB this is the ingestion head of
    * the §2.7 pipeline: splits come per-file, locality from the
    * storage layer, decode stays in the scan's mapPartitions. */
  def binaryRoundtrip(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dir = graft.sources.Fixtures.dirFor("src_binary", d, "documents")
    if (!graft.sources.Fixtures.ready(dir)) {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      ingest(graft.Tables.documents(s, d)).foreachPartition {
        (rows: Iterator[MediaFile]) =>
          rows.foreach { m =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(dir, s"${m.kind}_${m.media_id}.bin"), m.content)
          }
      }
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, "_SUCCESS"), Array[Byte]())
    }
    val media = s.read.format("binaryFile").load(dir)
      .where(!col("path").endsWith("_SUCCESS"))
      .select(
        regexp_extract(col("path"), "([a-z]+)_([0-9]+)\\.bin$", 2).cast("long").as("id"),
        regexp_extract(col("path"), "([a-z]+)_([0-9]+)\\.bin$", 1).as("kind"),
        col("content"))
      .as[(Long, String, Array[Byte])]
      .map { case (id, k, c) => MediaFile(id, k, c, MediaMeta(0, 0, 0, "bin")) }
    mediaSummary(media)
  }

  /** `mm_phash` signature geometry: [[SigPixels]] pixels hashed into a
    * 64-bit signature of four [[SigBandBits]]-bit bands; pairs within
    * Hamming distance [[HammingT]] are near-duplicates. HammingT < 4
    * is load-bearing: with 4 bands, ≤3 differing bits leave at least
    * one band EXACTLY equal (pigeonhole), which is what makes the
    * banded join complete. */
  val SigPixels = 16
  val SigBandBits = 16
  val HammingT = 3
  /** Planted perturbed-variant id offset and selection stride. */
  val VariantOffset = 1000000000L
  val VariantStride = 30L

  /** PERCEPTUAL-HASH signature from REAL decoded pixels: the first
    * [[SigPixels]] gray levels quantize into 64 bits — per pixel its
    * top 3 bits (bands 0-2: small intensity changes don't move them)
    * plus one pixel-above-mean bit (band 3: the average-hash bit,
    * invariant to global brightness). Both bit families are standard
    * perceptual-hash constructions (aHash mean bits; quantized
    * intensity) computed on the fixture's signature head, where the
    * image's entropy lives — and every bit is exact integer arithmetic
    * on decoded pixel values, so DuckDB re-derives the signature from
    * the digest the fixture encoded. */
  def phash(images: Dataset[MediaFile]): Dataset[ImageSig] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap(_.map { m =>
        val px = ImageCodec.headPixels(m.content, SigPixels, m.media_id)
        val total = px.foldLeft(0L)(_ + _)
        // bands 0-2: global bit i (0..47) = bit (7 - i%3) of pixel i/3
        def band(k: Int): Long = (0 until SigBandBits).foldLeft(0L) { (acc, i) =>
          val g = SigBandBits * k + i
          acc | (((px(g / 3).toLong >> (7 - g % 3)) & 1L) << i)
        }
        // band 3: aHash bits — pixel*16 > total is exact p > mean
        val b3 = (0 until SigPixels).foldLeft(0L) { (acc, j) =>
          acc | ((if (px(j) * SigPixels.toLong > total) 1L else 0L) << j)
        }
        ImageSig(m.media_id, band(0), band(1), band(2), b3)
      })
    }
  }

  /** Deterministic planted near-duplicates: every [[VariantStride]]-th
    * image re-enters with bit 5 of signature pixel 0 flipped — decode →
    * perturb → REAL PNG re-encode (the `text_pii` fixture pattern: the
    * synthetic corpus has no organic image near-dups, so the query
    * plants them, mirrored exactly by the oracle). The ±32 intensity
    * shift flips exactly one quantization bit; whether it also flips
    * mean bits depends on each image's margins — the oracle runs the
    * identical arithmetic, so borderline cases gate too. */
  def perturbVariants(images: Dataset[MediaFile]): Dataset[MediaFile] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.filter(m => m.media_id % VariantStride == 0).mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap(_.map { m =>
        val px = ImageCodec.headPixels(m.content, SigPixels + 1, m.media_id)
        val head = px.take(SigPixels).map(_.toByte)
        head(0) = (head(0) ^ 0x20).toByte
        val (w, h, _) = ImageCodec.decode(m.content, m.media_id)
        m.copy(media_id = m.media_id + VariantOffset,
          content = ImageCodec.encodePng(w, h, head, px(SigPixels)))
      })
    }
  }

  /** IMAGE NEAR-DUP via perceptual hash + MULTI-INDEX HASHING
    * (`mm_phash`) — the scalable Hamming-distance join (Norouzi et al.
    * 2012, the production image-dedup retrieval pattern): candidates
    * must agree EXACTLY on ≥1 of the 4 signature bands (pigeonhole,
    * [[HammingT]] < 4), so the join is 4 hash-bucket probes per image —
    * never an all-pairs scan — and digest-derived signature bits keep
    * every band bucket uniformly occupied (the skewed-band failure mode
    * of MIH is a fixture property, not a plan property). Emitted per
    * image (originals + planted variants): the 4 band values and the
    * count of near-duplicate neighbors at Hamming ≤ [[HammingT]].
    *
    * Scale: signatures persist (3 consumers — both join sides and the
    * final rejoin — over the expensive decode); shuffles carry
    * (band, value, id, 4 longs) = 4 rows/image; bucket join fan-out is
    * occupancy-bounded like the MinHash LSH band join; the final
    * neighbor count is one combiner aggregate. The oracle is the
    * deliberately independent quadratic formulation. */
  def phashNearDup(media: Dataset[MediaFile]): DataFrame = {
    val images = media.filter(col("kind") === "image")
    val sig = phash(images.union(perturbVariants(images))).toDF().persist()
    val bands = sig.select(col("media_id"), col("b0"), col("b1"), col("b2"), col("b3"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3"))).as(Seq("band", "bv")))
    val a = bands.alias("a")
    val b = bands.alias("b")
    val hamming = expr("bit_count(a.b0 ^ b.b0) + bit_count(a.b1 ^ b.b1) + " +
      "bit_count(a.b2 ^ b.b2) + bit_count(a.b3 ^ b.b3)")
    val pairs = a.join(b,
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.media_id") < col("b.media_id"))
      .where(hamming <= HammingT)
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"))
      .distinct()
    val near = pairs.select(col("id_a").as("media_id"))
      .union(pairs.select(col("id_b").as("media_id")))
      .groupBy("media_id").agg(count(lit(1)).as("n_near"))
    sig.join(near, Seq("media_id"), "left")
      .na.fill(0L, Seq("n_near"))
      .orderBy("media_id")
  }

  type Q = (SparkSession, String) => DataFrame
  /** Silence threshold in raw 16-bit amplitude units: head samples are
    * (digest_byte−128)·64, so the threshold sits at |byte−128| < 32;
    * tail samples are (n_chars%128)·32, silent iff n_chars%128 < 64 —
    * both branches exercised across the corpus. */
  val SilenceT = 2048

  /** SILENCE / ACTIVITY SEGMENTATION (`mm_silence`) — the
    * voice-activity-detection preprocessing every audio training
    * pipeline runs before transcription or segment extraction: per
    * audio file, decoded-PCM samples below [[SilenceT]] classify as
    * silent, and maximal silent RUNS are counted and measured
    * (gaps-and-islands on signal — `ev_gaps`' pattern at sample
    * granularity, run imperatively inside the decode batch). All
    * statistics come from the REAL decoded PCM; the oracle re-derives
    * them from the fixture arithmetic (16 digest-head samples + a
    * constant tail) as 17 per-file SEGMENTS and runs the identical
    * island construction in SQL — sample-level and segment-level runs
    * provably agree because consecutive equal flags merge identically.
    *
    * Scale: map-only per-file codec work (the `mm_resize` cost shape —
    * scales with file count, not bytes shuffled); output is one row per
    * audio file. */
  def silenceSummary(media: Dataset[MediaFile]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "audio")
      .mapPartitions(_.map { m =>
        val (n, nSil, nRuns, longest) =
          AudioCodec.silenceRuns(m.content, SilenceT, m.media_id)
        (m.media_id, n.toLong, nSil, nRuns, longest)
      })
      .toDF("media_id", "n_frames", "n_silent", "n_runs", "longest")
      .orderBy("media_id")
  }

  /** Fingerprint window width in PCM sample frames. */
  val FpWin = 64
  /** Energy-quantization divisor: a full 64-sample window of max
    * constant amplitude sums to ≈ 4·65536, so q = sum/65536 capped at 3
    * spreads the corpus across all four 2-bit codes. */
  val FpQDiv = 65536L

  /** AUDIO FINGERPRINT (`mm_audio_fp`) — the compact content signature
    * audio dedup/lookup systems index (Haitsma & Kalker 2002's
    * energy-band scheme, mono-band variant; Chromaprint/AcoustID ship
    * the same window-quantize-pack shape): per audio file, REAL decoded
    * PCM windows of [[FpWin]] samples each reduce to an exact
    * |amplitude| sum, quantize to a 2-bit code (min(3, sum/[[FpQDiv]])),
    * and pack little-endian into one BIGINT fingerprint. Files sharing
    * a fingerprint are audio near-duplicates at this resolution —
    * n_same_fp counts each file's fingerprint-group size, the
    * `dedup_exact` grouping applied to signal content instead of bytes
    * (byte-identical WAVs trivially share fp; re-encoded/transcoded
    * copies with identical PCM do too, which `mm_dedup`'s byte hash
    * cannot see).
    *
    * The oracle re-derives every window sum arithmetically from the
    * fixture construction (digest head + constant tail — the
    * `mm_silence` argument applied to energy instead of runs), so a
    * hash match proves the decoded windows carry exactly the PCM the
    * fixture encoded.
    *
    * Scale: map-only per-file codec work (the §2.7 file-count cost
    * model); the near-dup grouping is ONE combiner-friendly count
    * shuffle of skinny (fp) keys + a fingerprint-keyed rejoin — exact
    * hash-groupBy dedup shape, never pairwise. */
  def audioFingerprint(media: Dataset[MediaFile]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val fps = media.filter(col("kind") === "audio")
      .mapPartitions(_.map { m =>
        val (nw, fp) = AudioCodec.fingerprint(m.content, FpWin, FpQDiv, m.media_id)
        (m.media_id, nw.toLong, fp)
      })
      .toDF("media_id", "n_win", "fp")
    val groups = fps.groupBy("fp").agg(count(lit(1)).as("n_same_fp"))
    fps.join(groups, "fp")
      .select(col("media_id"), col("n_win"), col("fp"), col("n_same_fp"))
      .orderBy("media_id")
  }

  val HistBins = 4

  /** LUMINANCE HISTOGRAM (`mm_histogram`) — the exposure/content
    * statistic image-curation filters threshold on (all-dark,
    * all-blown, low-contrast screens): per image, every REAL decoded
    * pixel bins into [[HistBins]] equal-width luminance buckets. The
    * oracle re-derives each bin arithmetically — 16 digest-head pixels
    * bin individually, the constant-gray remainder lands wholesale in
    * one bin — so a hash match proves the decoded raster is the one
    * the fixture encoded, pixel-population-exactly (mm_summary proves
    * the SUM; this proves the DISTRIBUTION).
    *
    * Scale: map-only per-file codec work, one row per image — the
    * §2.7 file-count cost model. */
  def lumHistogramSummary(media: Dataset[MediaFile]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    // the emitted tuple and the h0..h3 schema (and the oracle's bin(k)
    // expansion) are all 4-wide by construction — pin the constant so
    // it cannot drift from the shape silently
    require(HistBins == 4, s"lumHistogramSummary emits exactly 4 bins, HistBins=$HistBins")
    media.filter(col("kind") === "image")
      .mapPartitions(_.map { m =>
        val h = ImageCodec.lumHistogram(m.content, HistBins, m.media_id)
        (m.media_id, h(0), h(1), h(2), h(3))
      })
      .toDF("media_id", "h0", "h1", "h2", "h3")
      .orderBy("media_id")
  }

  /** Embedding width for [[embedNearDup]] — 16 luminance bins (the
    * 4-bin histogram is too coarse to separate images whose dominant
    * gray differs by < 64 levels). */
  val EmbedBins = 16
  /** Result cut for the embedding near-dup ranking. */
  val EmbedTopPairs = 20

  /** IMAGE-EMBEDDING NEAR-DUP (`mm_embed`, r10) — the multimodal →
    * vector-search composition: decode every image, extract a feature
    * VECTOR (the [[EmbedBins]]-bin luminance histogram — the classical
    * pre-neural image descriptor; a learned CLIP-style encoder ships
    * through the same [[FeatureExtractor]] mount and changes nothing
    * downstream), then rank the most similar image pairs by exact
    * cosine WITHIN coarse cells — cell = the embedding's dominant bin
    * (first argmax), the 1-probe quantizer, so candidate pairs are
    * cell-confined exactly as [[graft.operators.Similarity.semanticDedup]]
    * confines document vectors (never all-pairs; a production corpus
    * raises the cell count, not this shape). Top-[[EmbedTopPairs]]
    * pairs by (cosine desc, a, b).
    *
    * Exactness: histograms are integer pixel counts, dot/norms are
    * exact BIGINT sums; the one float is cos = dot/sqrt(na2·nb2) —
    * int→double conversions, one multiply, one correctly-rounded sqrt,
    * one divide, bit-identical cross-engine. The oracle re-derives the
    * 16 bins arithmetically from the fixture construction (the
    * mm_histogram argument at 4× resolution), so a hash match proves
    * BOTH the decoded distribution and the vector-space ranking.
    *
    * Scale: decode is the §2.7 map-only file-count cost; embeddings
    * are skinny (id, 16 ints); the pair join is cell-bucketed. */
  def embedNearDup(media: Dataset[MediaFile]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val emb = media.filter(col("kind") === "image")
      .mapPartitions(_.map { m =>
        (m.media_id, ImageCodec.lumHistogram(m.content, EmbedBins, m.media_id))
      })
      .toDF("media_id", "emb")
      .select(col("media_id"), col("emb"),
        array_position(col("emb"), array_max(col("emb"))).as("cell"),
        aggregate(col("emb"), lit(0L), (acc, x) => acc + x * x).as("n2"))
    val a = emb.select(col("media_id").as("media_a"), col("cell"),
      col("emb").as("ea"), col("n2").as("na2"))
    val b = emb.select(col("media_id").as("media_b"), col("cell"),
      col("emb").as("eb"), col("n2").as("nb2"))
    a.join(b, "cell")
      .where(col("media_a") < col("media_b"))
      .select(col("media_a"), col("media_b"),
        (aggregate(zip_with(col("ea"), col("eb"), (x, y) => x * y),
            lit(0L), (acc, x) => acc + x).cast("double") /
          sqrt(col("na2").cast("double") * col("nb2").cast("double"))).as("cos"))
      .orderBy(col("cos").desc, col("media_a"), col("media_b"))
      .limit(EmbedTopPairs)
  }

  /** Scene-cut threshold: a boundary is a cut when the mean per-pixel
    * absolute luminance change exceeds this many gray levels —
    * compared as exact integers (SAD > threshold·n_pixels, no
    * division). */
  val SceneMeanDiff = 100L

  /** VIDEO SCENE-CHANGE DETECTION (`mm_scene`, r10) — the shot-boundary
    * operator every video-curation pipeline runs before sampling
    * (pick one frame per SHOT, not per fixed stride): consecutive
    * frames compare by SAD (sum of absolute per-pixel luminance
    * differences — the classical shot-boundary baseline), and a
    * boundary whose mean change exceeds [[SceneMeanDiff]] gray levels
    * is a cut. Per video: frame count, cut count, and the total SAD
    * across all boundaries — all exact integers.
    *
    * The fixture's videos have REAL planted cuts: frame f's body gray
    * is (n_chars + 7f) % 256, so within a "shot" consecutive frames
    * differ by 7 everywhere while the mod-256 WRAP is a hard cut
    * (|Δ| = 249); the 16 digest pixels are frame-constant and
    * contribute 0. The oracle re-derives every SAD arithmetically from
    * (n_chars) alone — a hash match proves the decoded per-pixel
    * deltas, not just the counts.
    *
    * Scale: map-only per-file codec work (the §2.7 cost model — cost
    * tracks file/frame count); one row per video out; the only shuffle
    * is the final sort. */
  def sceneCuts(media: Dataset[MediaFile]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "video")
      .mapPartitions(_.map { m =>
        val fr = VideoCodec.frames(m.content, m.media_id)
          .map(f => ImageCodec.pixels(f, m.media_id))
        val px = fr.head._1.toLong * fr.head._2
        val sads = fr.sliding(2).map { pair =>
          val (wa, ha, a) = pair(0)
          val (wb, hb, b) = pair(1)
          require(wa == wb && ha == hb, s"media ${m.media_id}: frame dims differ")
          var s = 0L
          var i = 0
          while (i < a.length) { s += math.abs(a(i) - b(i)); i += 1 }
          s
        }.toSeq
        (m.media_id, fr.length.toLong,
          sads.count(_ > SceneMeanDiff * px).toLong, sads.sum)
      })
      .toDF("media_id", "n_frames", "n_cuts", "total_sad")
      .orderBy("media_id")
  }

  val queries: Map[String, Q] = Map(
    "mm_embed"     -> ((s, d) => embedNearDup(mediaTable(s, d))),
    "mm_scene"     -> ((s, d) => sceneCuts(mediaTable(s, d))),
    "mm_histogram" -> ((s, d) => lumHistogramSummary(mediaTable(s, d))),
    "mm_silence" -> ((s, d) => silenceSummary(mediaTable(s, d))),
    "mm_audio_fp" -> ((s, d) => audioFingerprint(mediaTable(s, d))),
    "mm_summary" -> ((s, d) => mediaSummary(mediaTable(s, d))),
    "mm_dedup"   -> ((s, d) => mediaDedup(mediaTable(s, d))),
    "mm_frames"  -> ((s, d) => frameSummary(mediaTable(s, d))),
    "mm_resize"  -> ((s, d) => resizeSummary(mediaTable(s, d))),
    "mm_downsample" -> ((s, d) => downsampleSummary(mediaTable(s, d))),
    "pipe_mm"       -> ((s, d) => pipelineSummary(mediaTable(s, d))),
    "src_binary"    -> ((s, d) => binaryRoundtrip(s, d)),
    "mm_phash"      -> ((s, d) => phashNearDup(mediaTable(s, d))),
  )

  /** `mm_summary` runs the full binary pipeline (ingest → batched decode
    * → per-kind agg). Image AND audio statistics are measured from REAL
    * decoded media (ImageIO pixels, javax.sound PCM frames); DuckDB
    * derives the identical numbers arithmetically from
    * (n_chars, md5(text)) because both encodings are deterministic:
    * images — dimensions (8+n_chars%24)×(8+n_chars%16), luminance =
    * digest-byte sum + (pixels−16)·(n_chars%256), payload = pixels·3;
    * audio — 256+n_chars%512 PCM frames, payload = frames·2, |amplitude|
    * sum = Σ|digest_i−128|·64 + (frames−16)·(n_chars%128)·32. A
    * hash-match therefore proves the JDK codecs really decoded the
    * samples the fixtures encoded — §2.7 is driver-checked end to end. */
  private val DigestByteSum: String = (0 until 16)
    .map(i => s"('0x'||substr(dig,${2 * i + 1},2))::BIGINT").mkString(" + ")
  private val DigestAbsSum: String = (0 until 16)
    .map(i => s"abs(('0x'||substr(dig,${2 * i + 1},2))::BIGINT - 128) * 64").mkString(" + ")
  /** The digest |amplitude| terms surviving factor-2 decimation: even
    * sample indices 0, 2, …, 14 — 8 of the 16 head samples. */
  private val DigestAbsSumEven: String = (0 until 16 by 2)
    .map(i => s"abs(('0x'||substr(dig,${2 * i + 1},2))::BIGINT - 128) * 64").mkString(" + ")
  /** Σ over the container's frames of each frame's constant gray level
    * ((n_chars + 7f) % 256) — unrolled over the max 7 frames, each term
    * gated on the doc's own frame count. */
  private val VideoGraySum: String = (0 until 7)
    .map(f => s"(CASE WHEN vframes > $f THEN (n_chars + ${7 * f}) % 256 ELSE 0 END)")
    .mkString(" + ")
  /** Same sum restricted to the stride-2 SAMPLED frames (f = 0,2,4,6). */
  private val SampledGraySum: String = Seq(0, 2, 4, 6)
    .map(f => s"(CASE WHEN vframes > $f THEN (n_chars + ${7 * f}) % 256 ELSE 0 END)")
    .mkString(" + ")

  /** One oracle for the parquet-staged and file-staged decode paths. */
  private val MmSummarySql: String =
      s"""SELECT kind, count(*) AS n_files,
         |  CAST(sum(CASE WHEN kind = 'image' THEN px * 3
         |                WHEN kind = 'audio' THEN frames * 2
         |                ELSE px * 3 * vframes END) AS BIGINT) AS total_bytes,
         |  CAST(sum(CASE WHEN kind = 'video' THEN vframes
         |                WHEN kind = 'audio' THEN frames
         |                ELSE 1 END) AS BIGINT) AS total_frames,
         |  CAST(sum(CASE WHEN kind = 'image' THEN px
         |                WHEN kind = 'video' THEN px * vframes
         |                ELSE 0 END) AS BIGINT) AS total_pixels,
         |  CAST(sum(CASE WHEN kind = 'image'
         |           THEN $DigestByteSum + (px - 16) * (n_chars % 256)
         |                WHEN kind = 'audio'
         |           THEN $DigestAbsSum + (frames - 16) * (n_chars % 128) * 32
         |           ELSE vframes * ($DigestByteSum) + (px - 16) * ($VideoGraySum)
         |           END) AS BIGINT) AS total_lum
         |FROM (
         |  SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
         |         ELSE 'video' END AS kind,
         |    n_chars,
         |    (8 + n_chars % 24) * (8 + n_chars % 16) AS px,
         |    256 + n_chars % 512 AS frames,
         |    2 + n_chars % 6 AS vframes,
         |    md5(text) AS dig
         |  FROM documents) m
         |GROUP BY kind ORDER BY kind""".stripMargin

  /** `mm_phash` oracle fragments: the signature-pixel expressions and
    * band arithmetic mirrored in SQL. Pixel j of an image is digest
    * byte j (the fixture encodes md5(text) into the head pixels), so
    * every signature bit is integer arithmetic DuckDB reproduces. */
  private def oPix(j: Int): String = s"('0x'||substr(dig,${2 * j + 1},2))::BIGINT"
  private val PixCols: String = (0 until SigPixels).map(j => s"${oPix(j)} AS p$j").mkString(", ")
  private val PixTotal: String = (0 until SigPixels).map(j => s"p$j").mkString(" + ")
  private def oBand(k: Int): String =
    (0 until SigBandBits).map { i =>
      val g = SigBandBits * k + i
      s"(((p${g / 3} >> ${7 - g % 3}) & 1) << $i)"
    }.mkString(" + ")
  private val oBand3: String =
    (0 until SigPixels).map { j =>
      s"(CASE WHEN p$j * $SigPixels > ($PixTotal) THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")

  val oracle: Map[String, String] = Map(
    // the deliberately independent quadratic Hamming formulation —
    // gates both the signature bits and the banded join's completeness
    "mm_phash" ->
      s"""WITH base AS (
         |  SELECT doc_id AS media_id, $PixCols
         |  FROM (SELECT doc_id, md5(text) AS dig
         |        FROM documents WHERE doc_id % 3 = 0) d),
         |pix AS (
         |  SELECT media_id, ${(0 until SigPixels).map(j => s"p$j").mkString(", ")} FROM base
         |  UNION ALL
         |  SELECT media_id + $VariantOffset, xor(p0, 32),
         |    ${(1 until SigPixels).map(j => s"p$j").mkString(", ")}
         |  FROM base WHERE media_id % $VariantStride = 0),
         |sig AS (
         |  SELECT media_id,
         |    CAST(${oBand(0)} AS BIGINT) AS b0,
         |    CAST(${oBand(1)} AS BIGINT) AS b1,
         |    CAST(${oBand(2)} AS BIGINT) AS b2,
         |    CAST($oBand3 AS BIGINT) AS b3
         |  FROM pix)
         |SELECT s.media_id, s.b0, s.b1, s.b2, s.b3,
         |  CAST((SELECT count(*) FROM sig t WHERE t.media_id <> s.media_id
         |     AND bit_count(xor(s.b0, t.b0)) + bit_count(xor(s.b1, t.b1))
         |       + bit_count(xor(s.b2, t.b2)) + bit_count(xor(s.b3, t.b3))
         |       <= $HammingT) AS BIGINT) AS n_near
         |FROM sig s ORDER BY media_id""".stripMargin,
    "mm_summary" -> MmSummarySql,
    // 16 head pixels bin individually; the constant-gray remainder
    // lands wholesale in its own bin — bins partition the pixel count
    // the mm_histogram bin derivation at 16-bin resolution, packed into
    // a list; cell/argmax, norms, dot and cosine mirror the Spark
    // expressions term for term (exact ints until the one sqrt+divide)
    "mm_embed" -> {
      def bin(k: Int): String = {
        val head = (0 until 16).map(j =>
          s"(CASE WHEN ${oPix(j)} // ${256 / EmbedBins} = $k THEN 1 ELSE 0 END)")
          .mkString(" + ")
        s"CAST($head + (CASE WHEN (n_chars % 256) // ${256 / EmbedBins} = $k" +
          s" THEN px - 16 ELSE 0 END) AS BIGINT)"
      }
      val lst = (0 until EmbedBins).map(bin).mkString("[", ", ", "]")
      s"""WITH img AS (
         |  SELECT doc_id AS media_id, n_chars, md5(text) AS dig,
         |    (8 + n_chars % 24) * (8 + n_chars % 16) AS px
         |  FROM documents WHERE doc_id % 3 = 0),
         |e AS (SELECT media_id, $lst AS emb FROM img),
         |c AS (
         |  SELECT media_id, emb,
         |    list_position(emb, list_aggregate(emb, 'max')) AS cell,
         |    list_inner_product(emb::DOUBLE[], emb::DOUBLE[]) AS n2
         |  FROM e)
         |SELECT a.media_id AS media_a, b.media_id AS media_b,
         |  list_inner_product(a.emb::DOUBLE[], b.emb::DOUBLE[]) / sqrt(a.n2 * b.n2) AS cos
         |FROM c a JOIN c b ON a.cell = b.cell AND a.media_id < b.media_id
         |ORDER BY cos DESC, media_a, media_b LIMIT $EmbedTopPairs""".stripMargin
    },
    "mm_histogram" -> {
      def bin(k: Int): String = {
        val head = (0 until 16).map(j =>
          s"(CASE WHEN ${oPix(j)} // ${256 / HistBins} = $k THEN 1 ELSE 0 END)")
          .mkString(" + ")
        s"CAST($head + (CASE WHEN (n_chars % 256) // ${256 / HistBins} = $k" +
          s" THEN px - 16 ELSE 0 END) AS BIGINT)"
      }
      s"""SELECT doc_id AS media_id,
         |  ${bin(0)} AS h0, ${bin(1)} AS h1, ${bin(2)} AS h2, ${bin(3)} AS h3
         |FROM (
         |  SELECT doc_id, n_chars, md5(text) AS dig,
         |    (8 + n_chars % 24) * (8 + n_chars % 16) AS px
         |  FROM documents WHERE doc_id % 3 = 0) m
         |ORDER BY media_id""".stripMargin
    },
    // the fixture's 17 segments (16 digest-head samples + constant
    // tail) through the identical island construction: g = running
    // count of non-silent segments, consecutive silent segments share g
    // window k=0 mixes the 16 digest samples with 48 tail samples; all
    // later windows are constant-amplitude (possibly partial at the
    // end) — n ≥ 256 guarantees window 0 is full, n ≤ 767 caps k at 11
    "mm_audio_fp" ->
      s"""WITH au AS (
         |  SELECT doc_id AS media_id, md5(text) AS dig,
         |    256 + n_chars % 512 AS n, (n_chars % 128) * 32 AS camp
         |  FROM documents WHERE doc_id % 3 = 1),
         |win AS (
         |  SELECT media_id, k,
         |    CASE WHEN k = 0
         |      THEN ($DigestAbsSum) + ($FpWin - 16) * camp
         |      ELSE least($FpWin, n - $FpWin * k) * camp END AS sabs
         |  FROM au, unnest(range(0, 12)) AS t(k)
         |  WHERE $FpWin * k < n),
         |fps AS (
         |  SELECT media_id, CAST(count(*) AS BIGINT) AS n_win,
         |    CAST(sum(least(3, sabs // $FpQDiv) * (1::BIGINT << (2 * k))) AS BIGINT) AS fp
         |  FROM win GROUP BY media_id)
         |SELECT media_id, n_win, fp,
         |  count(*) OVER (PARTITION BY fp) AS n_same_fp
         |FROM fps ORDER BY media_id""".stripMargin,
    "mm_silence" ->
      s"""WITH au AS (
         |  SELECT doc_id AS media_id, n_chars, md5(text) AS dig,
         |    256 + n_chars % 512 AS n
         |  FROM documents WHERE doc_id % 3 = 1),
         |seg AS (
         |  SELECT media_id, i AS pos,
         |    CASE WHEN i < 16
         |      THEN CASE WHEN abs(('0x'||substr(dig, 2*i+1, 2))::BIGINT - 128) < ${SilenceT / 64}
         |           THEN 1 ELSE 0 END
         |      ELSE CASE WHEN n_chars % 128 < ${SilenceT / 32} THEN 1 ELSE 0 END END AS s,
         |    CASE WHEN i < 16 THEN 1 ELSE n - 16 END AS len
         |  FROM au, unnest(range(0, 17)) AS t(i)),
         |isl AS (
         |  SELECT media_id, s, len,
         |    SUM(CASE WHEN s = 0 THEN 1 ELSE 0 END) OVER (
         |      PARTITION BY media_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS g
         |  FROM seg),
         |runs AS (
         |  SELECT media_id, g, CAST(sum(len) AS BIGINT) AS runlen
         |  FROM isl WHERE s = 1 GROUP BY media_id, g),
         |agg AS (
         |  SELECT media_id, CAST(sum(runlen) AS BIGINT) AS n_silent,
         |    count(*) AS n_runs, CAST(max(runlen) AS BIGINT) AS longest
         |  FROM runs GROUP BY media_id)
         |SELECT a.media_id, CAST(a.n AS BIGINT) AS n_frames,
         |  COALESCE(g.n_silent, 0) AS n_silent,
         |  COALESCE(g.n_runs, 0) AS n_runs,
         |  COALESCE(g.longest, 0) AS longest
         |FROM au a LEFT JOIN agg g USING (media_id)
         |ORDER BY media_id""".stripMargin,
    // the file round-trip must be decode-indistinguishable from the
    // parquet-staged path
    "src_binary" -> MmSummarySql,
    // mm_summary with the audio column family decimated: frames2 =
    // ceil(frames/2) survivors (8 of the 16 digest samples — the even
    // indices — plus frames2−8 constants)
    "mm_downsample" ->
      s"""SELECT kind, count(*) AS n_files,
         |  CAST(sum(CASE WHEN kind = 'image' THEN px * 3
         |                WHEN kind = 'audio' THEN frames2 * 2
         |                ELSE px * 3 * vframes END) AS BIGINT) AS total_bytes,
         |  CAST(sum(CASE WHEN kind = 'video' THEN vframes
         |                WHEN kind = 'audio' THEN frames2
         |                ELSE 1 END) AS BIGINT) AS total_frames,
         |  CAST(sum(CASE WHEN kind = 'image' THEN px
         |                WHEN kind = 'video' THEN px * vframes
         |                ELSE 0 END) AS BIGINT) AS total_pixels,
         |  CAST(sum(CASE WHEN kind = 'image'
         |           THEN $DigestByteSum + (px - 16) * (n_chars % 256)
         |                WHEN kind = 'audio'
         |           THEN $DigestAbsSumEven + (frames2 - 8) * (n_chars % 128) * 32
         |           ELSE vframes * ($DigestByteSum) + (px - 16) * ($VideoGraySum)
         |           END) AS BIGINT) AS total_lum
         |FROM (
         |  SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
         |         ELSE 'video' END AS kind,
         |    n_chars,
         |    (8 + n_chars % 24) * (8 + n_chars % 16) AS px,
         |    256 + n_chars % 512 AS frames,
         |    (256 + n_chars % 512 + 1) // 2 AS frames2,
         |    2 + n_chars % 6 AS vframes,
         |    md5(text) AS dig
         |  FROM documents) m
         |GROUP BY kind ORDER BY kind""".stripMargin,
    // both transforms composed: audio decimates (frames2) and passes
    // resize; image/video land at the resize target dims
    "pipe_mm" -> {
      val px = ResizeW * ResizeH
      s"""SELECT kind, count(*) AS n_files,
         |  CAST(sum(CASE WHEN kind = 'image' THEN $px * 3
         |                WHEN kind = 'audio' THEN frames2 * 2
         |                ELSE $px * 3 * vframes END) AS BIGINT) AS total_bytes,
         |  CAST(sum(CASE WHEN kind = 'video' THEN vframes
         |                WHEN kind = 'audio' THEN frames2
         |                ELSE 1 END) AS BIGINT) AS total_frames,
         |  CAST(sum(CASE WHEN kind = 'image' THEN $px
         |                WHEN kind = 'video' THEN $px * vframes
         |                ELSE 0 END) AS BIGINT) AS total_pixels
         |FROM (
         |  SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
         |         ELSE 'video' END AS kind,
         |    (256 + n_chars % 512 + 1) // 2 AS frames2,
         |    2 + n_chars % 6 AS vframes
         |  FROM documents) m
         |GROUP BY kind ORDER BY kind""".stripMargin
    },
    "mm_resize" -> {
      val px = ResizeW * ResizeH
      s"""SELECT kind, count(*) AS n_files,
         |  CAST(sum(CASE WHEN kind = 'image' THEN $px * 3
         |                WHEN kind = 'audio' THEN frames * 2
         |                ELSE $px * 3 * vframes END) AS BIGINT) AS total_bytes,
         |  CAST(sum(CASE WHEN kind = 'video' THEN vframes
         |                WHEN kind = 'audio' THEN frames
         |                ELSE 1 END) AS BIGINT) AS total_frames,
         |  CAST(sum(CASE WHEN kind = 'image' THEN $px
         |                WHEN kind = 'video' THEN $px * vframes
         |                ELSE 0 END) AS BIGINT) AS total_pixels
         |FROM (
         |  SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
         |         ELSE 'video' END AS kind,
         |    256 + n_chars % 512 AS frames,
         |    2 + n_chars % 6 AS vframes
         |  FROM documents) m
         |GROUP BY kind ORDER BY kind""".stripMargin
    },
    "mm_frames" ->
      s"""SELECT CAST(sum(ns) AS BIGINT) AS n_sampled,
         |  CAST(sum(ns * px) AS BIGINT) AS total_px,
         |  CAST(sum(ns * ($DigestByteSum) + (px - 16) * graysum) AS BIGINT) AS total_lum
         |FROM (
         |  SELECT (vframes + 1) // 2 AS ns, px, dig, n_chars, vframes,
         |    $SampledGraySum AS graysum
         |  FROM (
         |    SELECT n_chars, (8 + n_chars % 24) * (8 + n_chars % 16) AS px,
         |      2 + n_chars % 6 AS vframes, md5(text) AS dig
         |    FROM documents WHERE doc_id % 3 = 2) v) t""".stripMargin,
    // every SAD re-derived from n_chars alone: body pixels (px - 16)
    // change by |((n_chars+7(f+1))%256) - ((n_chars+7f)%256)| (7 within
    // a shot, 249 at the mod-256 wrap = the planted hard cut), digest
    // pixels are frame-constant
    "mm_scene" ->
      s"""WITH v AS (
         |  SELECT doc_id, n_chars, 2 + n_chars % 6 AS nf,
         |    (8 + n_chars % 24) * (8 + n_chars % 16) AS px
         |  FROM documents WHERE doc_id % 3 = 2),
         |d AS (
         |  SELECT doc_id, nf, px,
         |    abs(((n_chars + 7 * (f + 1)) % 256) - ((n_chars + 7 * f) % 256)) AS diff
         |  FROM v, unnest(range(0, nf - 1)) AS t(f))
         |SELECT doc_id AS media_id, CAST(nf AS BIGINT) AS n_frames,
         |  CAST(coalesce(sum(CASE WHEN (px - 16) * diff > $SceneMeanDiff * px
         |                         THEN 1 END), 0) AS BIGINT) AS n_cuts,
         |  CAST(coalesce(sum((px - 16) * diff), 0) AS BIGINT) AS total_sad
         |FROM d GROUP BY doc_id, nf
         |ORDER BY media_id""".stripMargin,
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

/** REAL image codec — pure JDK (`javax.imageio`), no external
  * dependency. Encodes/decodes genuine PNG bytes; every statistic the
  * pipeline reports for images comes from pixels this codec actually
  * decoded. */
object ImageCodec {
  import java.awt.image.BufferedImage

  /** Deterministic grayscale PNG: w×h, first `head.length` pixels (in
    * row-major order) carry `head`'s bytes as gray levels, the rest are
    * the constant `gray`. PNG is lossless, so a decode recovers these
    * values exactly. */
  def encodePng(w: Int, h: Int, head: Array[Byte], gray: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var p = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = if (p < head.length) head(p) & 0xff else gray
        img.setRGB(x, y, g * 0x010101)
        p += 1; x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode PNG bytes → (width, height, luminance sum over all pixels).
    * Fails loud on undecodable content (a silent null would surface as
    * an oracle mismatch far from the cause). */
  def decode(content: Array[Byte], mediaId: Long): (Int, Int, Long) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
    require(img != null, s"media $mediaId: content is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    var lum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { lum += (img.getRGB(x, y) & 0xff); x += 1 }
      y += 1
    }
    (w, h, lum)
  }

  /** One decode pass binning every pixel's luminance into
    * `bins` equal-width buckets (256/bins levels each) — the exposure/
    * content statistic image curation filters threshold on. */
  def lumHistogram(content: Array[Byte], bins: Int, mediaId: Long): Array[Long] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
    require(img != null, s"media $mediaId: content is not a decodable image")
    val width = 256 / bins
    val h = new Array[Long](bins)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        h((img.getRGB(x, y) & 0xff) / width) += 1
        x += 1
      }
      y += 1
    }
    h
  }

  /** Decode PNG bytes → (w, h, every pixel's gray level in row-major
    * order) — the full-frame read the scene-change SAD needs. Fails
    * loud on undecodable content. */
  def pixels(content: Array[Byte], mediaId: Long): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
    require(img != null, s"media $mediaId: content is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    val a = new Array[Int](w * h)
    var p = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { a(p) = img.getRGB(x, y) & 0xff; p += 1; x += 1 }
      y += 1
    }
    (w, h, a)
  }

  /** Decode PNG bytes → the first `n` pixels' gray levels in row-major
    * order (the signature head `mm_phash` hashes). Fails loud on
    * undecodable content or an image smaller than `n` pixels. */
  def headPixels(content: Array[Byte], n: Int, mediaId: Long): Array[Int] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
    require(img != null, s"media $mediaId: content is not a decodable image")
    val w = img.getWidth
    require(w.toLong * img.getHeight >= n, s"media $mediaId: fewer than $n pixels")
    Array.tabulate(n)(p => img.getRGB(p % w, p / w) & 0xff)
  }

  /** Real resize: decode → Graphics2D rescale → PNG re-encode. */
  def resize(content: Array[Byte], w: Int, h: Int, mediaId: Long): Array[Byte] = {
    val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
    require(src != null, s"media $mediaId: content is not a decodable image")
    val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = dst.createGraphics()
    g.drawImage(src, 0, 0, w, h, null)
    g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(dst, "png", bos)
    bos.toByteArray
  }
}

/** REAL audio codec — pure JDK (`javax.sound.sampled`), no external
  * dependency. Encodes/decodes genuine RIFF/WAVE bytes (16-bit signed
  * PCM, mono, little-endian); the frame count and amplitude statistics
  * the pipeline reports for audio come from samples this codec actually
  * decoded. */
object AudioCodec {
  import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

  val Rate = 8000

  private def format = new AudioFormat(Rate.toFloat, 16, 1, true, false)

  /** Deterministic WAV: `n` sample frames, the first `head.length`
    * samples carrying `head`'s bytes as ((b&0xff)−128)·64, the rest the
    * constant amplitude `amp`·32. PCM is lossless, so a decode recovers
    * these values exactly. */
  def encodeWav(n: Int, head: Array[Byte], amp: Int): Array[Byte] = {
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = if (i < head.length) ((head(i) & 0xff) - 128) * 64 else amp * 32
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    val stream = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), format, n.toLong)
    AudioSystem.write(stream, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL decimation: decode the WAV, keep every `factor`-th sample
    * frame (indices 0, factor, 2·factor, …), re-encode. PCM is
    * lossless, so the surviving samples round-trip bit-exactly — which
    * is what lets the `mm_downsample` oracle re-derive the decimated
    * |amplitude| sum arithmetically. The header keeps [[Rate]]
    * (time-compression semantics); a player-facing resample would also
    * halve the declared rate, which changes no gated statistic. */
  def decimate(content: Array[Byte], factor: Int, mediaId: Long): Array[Byte] = {
    val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(content))
    val fmt = in.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
      s"media $mediaId: unexpected audio format $fmt")
    val pcm = in.readAllBytes()
    val n = pcm.length / 2
    val n2 = (n + factor - 1) / factor
    val out = new Array[Byte](n2 * 2)
    var i = 0
    while (i < n2) {
      out(2 * i) = pcm(2 * i * factor)
      out(2 * i + 1) = pcm(2 * i * factor + 1)
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    val stream = new AudioInputStream(
      new java.io.ByteArrayInputStream(out), format, n2.toLong)
    AudioSystem.write(stream, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode WAV bytes → (sample-frame count, |amplitude| sum). Fails
    * loud on undecodable content or a non-16-bit/mono format (a silent
    * zero would surface as an oracle mismatch far from the cause). */
  def decode(content: Array[Byte], mediaId: Long): (Int, Long) = {
    val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(content))
    val fmt = in.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
      s"media $mediaId: unexpected audio format $fmt")
    val pcm = in.readAllBytes()
    val n = pcm.length / 2
    var absSum = 0L
    var i = 0
    while (i < n) {
      val v = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toInt
      absSum += math.abs(v)
      i += 1
    }
    (n, absSum)
  }

  /** One decode pass computing SILENCE run-length statistics: a sample
    * is silent when |amplitude| < `threshold`; returns (frame count,
    * silent-sample count, number of maximal silent runs, longest silent
    * run). Imperative single pass over the real decoded PCM — the
    * per-sample mirror of the gaps-and-islands window pattern the event
    * operators run (`Events.sessionize`), applied to signal. */
  def silenceRuns(content: Array[Byte], threshold: Int, mediaId: Long): (Int, Long, Long, Long) = {
    val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(content))
    val fmt = in.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
      s"media $mediaId: unexpected audio format $fmt")
    val pcm = in.readAllBytes()
    val n = pcm.length / 2
    var nSilent = 0L
    var nRuns = 0L
    var longest = 0L
    var cur = 0L
    var i = 0
    while (i < n) {
      val v = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toInt
      if (math.abs(v) < threshold) {
        if (cur == 0L) nRuns += 1
        cur += 1
        nSilent += 1
        if (cur > longest) longest = cur
      } else cur = 0L
      i += 1
    }
    (n, nSilent, nRuns, longest)
  }

  /** One decode pass computing the energy FINGERPRINT: window the PCM
    * into `win`-sample frames; per window sum |amplitude| exactly
    * (long); quantize q_k = min(3, sum_k / qdiv); pack the 2-bit codes
    * little-endian, fp = Σ q_k·4^k. Returns (window count, fp). */
  def fingerprint(content: Array[Byte], win: Int, qdiv: Long, mediaId: Long): (Int, Long) = {
    val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(content))
    val fmt = in.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
      s"media $mediaId: unexpected audio format $fmt")
    val pcm = in.readAllBytes()
    val n = pcm.length / 2
    val m = (n + win - 1) / win
    require(m <= 31, s"media $mediaId: $m windows overflow the 2-bit-packed long")
    var fp = 0L
    var k = 0
    while (k < m) {
      var s = 0L
      var i = k * win
      val end = math.min(n, (k + 1) * win)
      while (i < end) {
        val v = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toInt
        s += math.abs(v)
        i += 1
      }
      fp |= math.min(3L, s / qdiv) << (2 * k)
      k += 1
    }
    (m, fp)
  }
}

/** REAL video container — motion-PNG ("MPNG"). The JDK ships no video
  * CODEC, so the container format is bespoke, but everything inside it
  * is genuinely decoded: a magic + frame-count + length-table header
  * wraps N standalone PNG frames, and every statistic the pipeline
  * reports for video comes from per-frame [[ImageCodec]] decodes of
  * those bytes — the same decode path MJPEG uses with JPEG frames. A
  * production build swaps the container parser for an ffmpeg/JNI
  * demuxer; the per-frame decode, sampling, and resize stages keep
  * their exact shape. */
object VideoCodec {
  private val Magic = Array[Byte]('M', 'P', 'N', 'G')

  /** Container layout: "MPNG" | int32 n | int32 len×n | PNG payloads. */
  def encodeMpng(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.write(Magic)
    out.writeInt(frames.size)
    frames.foreach(f => out.writeInt(f.length))
    frames.foreach(out.write)
    out.flush()
    bos.toByteArray
  }

  /** Parse the container into its standalone PNG frames. Fails loud on
    * non-MPNG content (a silent empty would surface as an oracle
    * mismatch far from the cause). */
  def frames(content: Array[Byte], mediaId: Long): Seq[Array[Byte]] = {
    require(content.length >= 8 && content.take(4).sameElements(Magic),
      s"media $mediaId: content is not an MPNG container")
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(content))
    in.skipBytes(4)
    val n = in.readInt()
    val lens = Vector.fill(n)(in.readInt())
    lens.map { l => val b = new Array[Byte](l); in.readFully(b); b }
  }

  /** Decode → (frame count, width, height, decoded RGB payload bytes,
    * luminance sum over every pixel of every frame) — all from REAL
    * per-frame PNG decodes. */
  def decode(content: Array[Byte], mediaId: Long): (Int, Int, Int, Long, Long) = {
    val fs = frames(content, mediaId)
    var lum = 0L; var bytes = 0L; var w = 0; var h = 0
    fs.foreach { f =>
      val (fw, fh, fl) = ImageCodec.decode(f, mediaId)
      w = fw; h = fh; lum += fl; bytes += fw.toLong * fh * 3
    }
    (fs.size, w, h, bytes, lum)
  }
}

/** The feature-extractor MOUNT POINT — the one boundary where a real
  * vision/audio model plugs into the multimodal pipeline. The contract
  * is deliberately the shape a production extractor needs:
  *
  *  - '''Serializable''': instances ship to executors inside the
  *    `mapPartitions` closure; a real implementation holds a model
  *    HANDLE (path, config) and materializes the heavyweight state
  *    lazily per JVM (`@transient lazy val session = load(...)`), the
  *    standard Spark pattern for JNI/ONNX/Arrow-worker resources.
  *  - '''Batched''': one call per [[Multimodal.BatchSize]]-row group —
  *    exactly where a model amortizes its per-invocation overhead
  *    (tensor batch assembly, Arrow IPC round-trip, GPU dispatch).
  *  - '''Positional''': returns exactly `batch.size` vectors of
  *    [[Multimodal.FeatureDim]] floats, row i's vector at index i
  *    ([[Multimodal.decodeBatch]] enforces both).
  *
  * The default instance is [[Md5Extractor]] (deterministic md5-chain
  * pseudo-embedding — the documented stand-in that keeps the `mm_*`
  * oracle gates engine-exact); MultimodalSpec demonstrates a swapped-in
  * extractor flowing through `featurize` end to end. */
trait FeatureExtractor extends Serializable {
  /** One feature vector per input row, in input order. `MediaFile`
    * carries the decoded-media bytes AND the typed metadata (media_id,
    * kind) a model needs for per-modality routing. */
  def extractBatch(batch: Seq[MediaFile]): Seq[Array[Float]]
}

/** Default [[FeatureExtractor]]: the deterministic md5-chain
  * pseudo-embedding ([[MultimodalStub.pseudoFeature]]). */
object Md5Extractor extends FeatureExtractor {
  def extractBatch(batch: Seq[MediaFile]): Seq[Array[Float]] =
    batch.map(m => MultimodalStub.pseudoFeature(m.content))
}

/** The md5-chain pseudo-embedding behind [[Md5Extractor]] — a stand-in
  * for a real model's vectors (a real build mounts its model via
  * [[FeatureExtractor]], without touching the batch plumbing). All
  * three media kinds decode for real: [[ImageCodec]] (PNG),
  * [[AudioCodec]] (WAV), [[VideoCodec]] (MPNG per-frame PNG). */
object MultimodalStub {

  private def md5(bytes: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("MD5").digest(bytes)

  /** Deterministic pseudo-embedding: chained md5, 16 floats in [0,1). */
  def pseudoFeature(content: Array[Byte]): Array[Float] = {
    val feature = new Array[Float](Multimodal.FeatureDim)
    var cur = md5(content)
    var i = 0
    while (i < Multimodal.FeatureDim) {
      feature(i) = ((cur(0) & 0xff) * 256 + (cur(1) & 0xff)) / 65536.0f
      cur = md5(cur)
      i += 1
    }
    feature
  }
}
