package graft

import graft.operators.{AudioCodec, ImageCodec, Multimodal, MediaFile, MediaMeta, VideoCodec}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf)

  test("ingest: binary content survives a parquet round-trip with typed meta") {
    val media = Multimodal.ingest(docs.limit(20))
    val tmp = java.nio.file.Files.createTempDirectory("graft-media").toString
    media.write.mode("overwrite").parquet(tmp)
    val back = spark.read.parquet(tmp)
    assert(back.schema("content").dataType.typeName == "binary")
    assert(back.schema("meta").dataType.typeName == "struct")
    assert(back.count() == 20)
    // content bytes identical after round-trip
    val orig = media.collect().map(m => m.media_id -> m.content.toSeq).toMap
    val rb = back.select("media_id", "content").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(orig == rb)
  }

  test("featurize: deterministic features, stable across partitionings") {
    val media = Multimodal.ingest(docs)
    val f1 = Multimodal.featurize(media).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    val f2 = Multimodal.featurize(media.repartition(7)).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    assert(f1 == f2)
    assert(f1.values.forall(v => v.length == Multimodal.FeatureDim))
    assert(f1.values.forall(v => v.forall(x => x >= 0f && x < 1f)))
  }

  test("FeatureExtractor mount point: a swapped-in extractor's vectors flow through featurize; contract enforced") {
    // The model boundary (VERDICT r6 #6): featurize(media, extractor)
    // must carry an arbitrary batched extractor's vectors end to end —
    // only the extractor changes, decode/meta/batch plumbing identical.
    import graft.operators.FeatureExtractor
    val media = Multimodal.ingest(docs.limit(40))
    // a "model" distinguishable from the md5 default: vector encodes the
    // media_id and the batch's size — proves batching AND positional
    // alignment survived the partition/group plumbing
    object IdExtractor extends FeatureExtractor {
      def extractBatch(batch: Seq[MediaFile]): Seq[Array[Float]] =
        batch.map { m =>
          val v = new Array[Float](Multimodal.FeatureDim)
          v(0) = m.media_id.toFloat
          v(1) = batch.size.toFloat
          v(2) = if (m.kind == "audio") 1f else 0f
          v
        }
    }
    val got = Multimodal.featurize(media.repartition(5), IdExtractor).collect()
    val kinds = media.collect().map(m => m.media_id -> m.kind).toMap
    assert(got.nonEmpty && got.forall(f => f.feature(0) == f.media_id.toFloat),
      "positional alignment lost: row got another row's vector")
    assert(got.forall(f => f.feature(1) >= 1f && f.feature(1) <= Multimodal.BatchSize.toFloat),
      "extractor saw batches outside the BatchSize contract")
    assert(got.forall(f => f.feature(2) == (if (kinds(f.media_id) == "audio") 1f else 0f)),
      "typed meta (kind) did not reach the extractor")
    // decode stats are extractor-independent: same rows as the default
    val defStats = Multimodal.featurize(media).collect()
      .map(f => f.media_id -> (f.n_bytes, f.n_frames, f.width, f.height, f.lum)).toMap
    assert(got.map(f => f.media_id -> (f.n_bytes, f.n_frames, f.width, f.height, f.lum)).toMap
      == defStats, "swapping the extractor changed decode results")
    // the contract fails loud, not silent: wrong dim is rejected
    object BadDim extends FeatureExtractor {
      def extractBatch(batch: Seq[MediaFile]): Seq[Array[Float]] =
        batch.map(_ => new Array[Float](3))
    }
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.featurize(media, BadDim).collect()
    }
    assert(ex.getMessage.contains("FeatureDim") ||
      Option(ex.getCause).exists(_.getMessage.contains("FeatureDim")))
  }

  test("decode batch: frame semantics per kind, all three kinds through real codecs") {
    val png = ImageCodec.encodePng(10, 5, Array[Byte](1, 2, 3), 7)
    val wav = AudioCodec.encodeWav(40, Array[Byte](130.toByte, 126), 5)
    val mpng = VideoCodec.encodeMpng(Seq(
      ImageCodec.encodePng(6, 4, Array[Byte](9), 2),
      ImageCodec.encodePng(6, 4, Array[Byte](9), 3),
      ImageCodec.encodePng(6, 4, Array[Byte](9), 4)))
    val out = Multimodal.decodeBatch(Seq(
      MediaFile(1, "image", png, MediaMeta(10, 5, 0, "png")),
      MediaFile(2, "video", mpng, MediaMeta(6, 4, 0, "mpng")),
      MediaFile(3, "audio", wav, MediaMeta(0, 0, AudioCodec.Rate, "wav"))))
    assert(out.map(_.n_frames) == Seq(1, 3, 40))
    // image: decoded dims and payload from the REAL decode
    assert(out(0).width == 10 && out(0).height == 5)
    assert(out(0).n_bytes == 10L * 5 * 3)
    assert(out(0).lum == 1 + 2 + 3 + (50 - 3) * 7)
    // video: per-frame REAL decodes (3 frames of 6×4)
    assert(out(1).width == 6 && out(1).height == 4)
    assert(out(1).n_bytes == 3L * 6 * 4 * 3)
    assert(out(1).lum == 3 * 9 + 23L * (2 + 3 + 4))
    // audio: decoded PCM payload and |amplitude| sum from the REAL decode
    assert(out(2).n_bytes == 40L * 2)
    assert(out(2).lum == (130 - 128).abs * 64 + (126 - 128).abs * 64 + 38L * 5 * 32)
  }

  test("sceneCuts: SAD from real decoded pixels — a hard cut fires, a 7-level drift doesn't, head pixels contribute 0") {
    val sp = spark
    import sp.implicits._
    // 10×8 frames (80 px, 16 digest-head px identical everywhere):
    // grays 10 → 17 → 250: boundary 1 SAD = 64·7 = 448 (mean 5.6, no
    // cut); boundary 2 SAD = 64·233 = 14912 > 100·80 (cut)
    val head = Array.tabulate(16)(i => (i * 3).toByte)
    val mpng = VideoCodec.encodeMpng(Seq(
      ImageCodec.encodePng(10, 8, head, 10),
      ImageCodec.encodePng(10, 8, head, 17),
      ImageCodec.encodePng(10, 8, head, 250)))
    val media = sp.createDataset(Seq(
      MediaFile(5L, "video", mpng, MediaMeta(10, 8, 0, "mpng")),
      MediaFile(6L, "image", ImageCodec.encodePng(4, 4, head, 1),
        MediaMeta(4, 4, 0, "png"))))  // non-video: excluded
    val r = Multimodal.sceneCuts(media).as[(Long, Long, Long, Long)].collect()
    assert(r.toSeq == Seq((5L, 3L, 1L, 448L + 14912L)), r.mkString("; "))
  }

  test("mm_embed: identical rasters rank first at cos 1.0; cross-cell pairs never pair; cos matches hand math") {
    val s = spark
    import s.implicits._
    // ids 1,2: identical dark images (dominant bin 0 → same cell);
    // id 3: dark but different head (same cell, cos < 1);
    // id 4: bright (dominant bin 15 → different cell, never paired)
    def img(id: Long, head: Array[Byte], gray: Int) =
      MediaFile(id, "image", ImageCodec.encodePng(8, 8, head, gray),
        MediaMeta(8, 8, 0, "png"))
    val m = s.createDataset(Seq(
      img(1, Array[Byte](10, 20, 30), 5),
      img(2, Array[Byte](10, 20, 30), 5),
      img(3, Array[Byte](100, 110, 120), 5),
      img(4, Array[Byte](10, 20, 30), 250)))
    val r = Multimodal.embedNearDup(m).as[(Long, Long, Double)].collect()
    assert(r.head == ((1L, 2L, 1.0)), r.mkString(", "))
    // 4 shares no cell with anyone → exactly the 3 dark-cell pairs
    assert(r.map(t => (t._1, t._2)).toSet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // hand math: histograms over 64 pixels, width-16 bins
    def hist(head: Array[Int], gray: Int): Array[Long] = {
      val h = new Array[Long](16)
      (head ++ Array.fill(64 - head.length)(gray)).foreach(p => h(p / 16) += 1)
      h
    }
    val h1 = hist(Array(10, 20, 30), 5)
    val h3 = hist(Array(100, 110, 120), 5)
    def cos(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => x * y }.sum.toDouble /
        math.sqrt(a.map(x => x * x).sum.toDouble * b.map(x => x * x).sum.toDouble)
    val got13 = r.find(t => t._1 == 1L && t._2 == 3L).get._3
    assert(got13 == cos(h1, h3), s"$got13 != ${cos(h1, h3)}")
    assert(got13 < 1.0)
  }

  test("video codec: MPNG encode→parse→decode round-trips exact frames") {
    val f0 = ImageCodec.encodePng(5, 4, Array[Byte](10, 20), 9)
    val f1 = ImageCodec.encodePng(5, 4, Array[Byte](10, 20), 11)
    val mpng = VideoCodec.encodeMpng(Seq(f0, f1))
    assert(mpng(0) == 'M' && mpng(1) == 'P' && mpng(2) == 'N' && mpng(3) == 'G')
    val back = VideoCodec.frames(mpng, 0)
    assert(back.map(_.toSeq) == Seq(f0.toSeq, f1.toSeq))
    val (n, w, h, bytes, lum) = VideoCodec.decode(mpng, 0)
    assert(n == 2 && w == 5 && h == 4 && bytes == 2L * 5 * 4 * 3)
    assert(lum == 2 * (10 + 20) + 18L * (9 + 11))
    intercept[IllegalArgumentException] { VideoCodec.frames(Array.fill(64)(7.toByte), 42) }
    // zero-frame container round-trips (degenerate but well-formed)
    val empty = VideoCodec.encodeMpng(Seq.empty)
    assert(VideoCodec.frames(empty, 0).isEmpty)
    assert(VideoCodec.decode(empty, 0) == ((0, 0, 0, 0L, 0L)))
  }

  test("audio codec: WAV encode→decode round-trips exact samples") {
    val head = Array.range(0, 16).map(i => (i * 17 % 256).toByte)
    val wav = AudioCodec.encodeWav(100, head, 11)
    // RIFF/WAVE magic — the blob really is a WAV file
    assert(wav(0) == 'R' && wav(1) == 'I' && wav(2) == 'F' && wav(3) == 'F')
    assert(wav(8) == 'W' && wav(9) == 'A' && wav(10) == 'V' && wav(11) == 'E')
    val (frames, absSum) = AudioCodec.decode(wav, 0)
    assert(frames == 100)
    val expected = head.map(b => ((b & 0xff) - 128).abs.toLong * 64).sum + (100 - 16).toLong * 11 * 32
    assert(absSum == expected)
  }

  test("audio decimate: exactly the even-index samples survive, odd count keeps the extra frame") {
    val head = Array.range(0, 16).map(i => (i * 17 % 256).toByte)
    // odd frame count: ceil(101/2) = 51 survivors (8 digest + 43 constant)
    val wav = AudioCodec.encodeWav(101, head, 11)
    val down = AudioCodec.decimate(wav, 2, 0)
    val (frames, absSum) = AudioCodec.decode(down, 0)
    assert(frames == 51)
    val expected = head.zipWithIndex.collect { case (b, i) if i % 2 == 0 =>
      ((b & 0xff) - 128).abs.toLong * 64 }.sum + (51 - 8).toLong * 11 * 32
    assert(absSum == expected)
    // factor 3 for good measure: indices 0,3,6,... → ceil(101/3) = 34
    val (f3, _) = AudioCodec.decode(AudioCodec.decimate(wav, 3, 0), 0)
    assert(f3 == 34)
  }

  test("downsample: audio rows decimate, image/video rows byte-identical") {
    val media = Multimodal.ingest(docs)
    val down = Multimodal.downsample(media, 2).collect()
    val orig = media.collect().map(m => m.media_id -> m).toMap
    for (m <- down) {
      if (m.kind == "audio") {
        val (n0, _) = AudioCodec.decode(orig(m.media_id).content, m.media_id)
        val (n1, _) = AudioCodec.decode(m.content, m.media_id)
        assert(n1 == (n0 + 1) / 2, s"media ${m.media_id}: $n0 -> $n1")
      } else {
        assert(java.util.Arrays.equals(m.content, orig(m.media_id).content))
      }
    }
  }

  test("audio codec fails loud on undecodable bytes") {
    intercept[Exception] {
      AudioCodec.decode(Array.fill(64)(7.toByte), 42)
    }
  }

  test("image codec: PNG encode→decode round-trips exact pixels") {
    val head = Array.range(0, 16).map(i => (i * 17 % 256).toByte)
    val png = ImageCodec.encodePng(9, 8, head, 123)
    // PNG magic bytes — the blob really is a PNG file
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val (w, h, lum) = ImageCodec.decode(png, 0)
    assert(w == 9 && h == 8)
    val expected = head.map(_ & 0xff).sum + (9 * 8 - 16).toLong * 123
    assert(lum == expected)
    // real resize: decoded dims follow the request
    val (rw, rh, _) = ImageCodec.decode(ImageCodec.resize(png, 4, 3, 0), 0)
    assert(rw == 4 && rh == 3)
  }

  test("image codec fails loud on undecodable bytes") {
    intercept[IllegalArgumentException] {
      ImageCodec.decode(Array.fill(64)(7.toByte), 42)
    }
  }

  test("resize: image/video content rescales with meta, audio passes through") {
    val media = Multimodal.ingest(docs.limit(30))
    val resized = Multimodal.resize(media, 32, 32)
    assert(resized.count() == 30)
    val byKind = resized.collect().groupBy(_.kind)
    for (m <- byKind.getOrElse("image", Array()) ++ byKind.getOrElse("video", Array())) {
      assert(m.meta.width == 32 && m.meta.height == 32)
      assert(m.content.nonEmpty)
    }
    val origAudio = media.filter(_.kind == "audio").collect().map(m => m.media_id -> m.content.toSeq).toMap
    val newAudio = byKind.getOrElse("audio", Array()).map(m => m.media_id -> m.content.toSeq).toMap
    assert(origAudio == newAudio)
    // deterministic: same input, same output
    assert(Multimodal.resize(media, 32, 32).collect().map(_.content.toSeq).toSeq ==
      resized.collect().map(_.content.toSeq).toSeq)
  }

  test("frameSample: one row per sampled REAL frame, each a decodable standalone PNG") {
    val media = Multimodal.ingest(docs.limit(30))
    val frames = Multimodal.frameSample(media, stride = 2)
    assert(frames.filter(_.kind != "frame").count() == 0)
    val expected = media.filter(_.kind == "video").collect()
      .map(m => (VideoCodec.frames(m.content, m.media_id).size + 1) / 2).sum
    assert(frames.count() == expected)
    // every sampled frame is itself a real image the downstream image
    // stages can decode
    for (f <- frames.collect()) {
      val (w, h, _) = ImageCodec.decode(f.content, f.media_id)
      assert(w == f.meta.width && h == f.meta.height)
    }
  }

  test("pipelineSummary: composed stages agree with each stage's own gate") {
    val media = Multimodal.ingest(docs)
    val pipe = Multimodal.pipelineSummary(media).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    // audio frames must equal the downsample stage's (resize passes audio)
    val down = Multimodal.downsampleSummary(media).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(pipe("audio")._2 == down("audio"))
    // image/video pixels must equal the resize stage's (downsample passes them)
    val rs = Multimodal.resizeSummary(media).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    val pipePx = Multimodal.pipelineSummary(media).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(pipePx("image") == rs("image") && pipePx("video") == rs("video"))
  }

  test("mediaSummary groups all files by kind") {
    val s = Multimodal.mediaSummary(Multimodal.ingest(docs))
    val total = s.agg(sum("n_files")).collect()(0).getLong(0)
    assert(total == docs.count())
    assert(s.count() == 3)
  }

  /** 8×8 gray test image with a chosen 16-pixel signature head. Pixel
    * values alternate 0x40/0xC0 so every aHash margin is huge — bit-5
    * perturbations (±32) can never flip a mean bit, making Hamming
    * distances exactly predictable. */
  private def sigImage(id: Long, flips: Seq[Int]): MediaFile = {
    val head = Array.tabulate(16)(j => if (j % 2 == 0) 0x40 else 0xC0)
    flips.foreach(j => head(j) ^= 0x20)
    MediaFile(id, "image", ImageCodec.encodePng(8, 8, head.map(_.toByte), 0x40),
      MediaMeta(8, 8, 0, "png"))
  }

  test("phash: one intensity perturbation flips exactly one quantization bit, no mean bits") {
    val s = spark
    import s.implicits._
    val sigs = Multimodal.phash(Seq(sigImage(1, Nil), sigImage(2, Seq(0))).toDS())
      .collect().sortBy(_.media_id)
    // pixel 0, bit 5 → global bit g = 3·0+2 = 2 → band 0, position 2
    assert((sigs(0).b0 ^ sigs(1).b0) == 4L, s"b0 xor ${sigs(0).b0 ^ sigs(1).b0}")
    assert(sigs(0).b1 == sigs(1).b1 && sigs(0).b2 == sigs(1).b2)
    assert(sigs(0).b3 == sigs(1).b3, "aHash band must not move under a ±32 shift with 64-gray margins")
  }

  test("phash near-dup: pigeonhole finds a pair with its 3 diffs spread over 3 bands; distant pair absent") {
    val s = spark
    import s.implicits._
    // B differs from A in pixels 0, 6, 11 → global bits 2, 20, 35 —
    // one per quantization band, NO band equal among 0-2; only the
    // untouched aHash band matches, which is exactly the pigeonhole
    // guarantee (≤3 errors, 4 bands → ≥1 exact band)
    val a = sigImage(101, Nil)
    val b = sigImage(102, Seq(0, 6, 11))
    val far = sigImage(103, (0 until 16).toList) // every pixel perturbed
    val r = Multimodal.phashNearDup(Seq(a, b, far).toDS())
      .select("media_id", "n_near").as[(Long, Long)].collect().toMap
    assert(r(101L) == 1 && r(102L) == 1, s"pigeonhole pair missed: $r")
    assert(r(103L) == 0, s"distant image matched: $r")
  }

  test("phash near-dup corpus: planted variants pair with their originals, symmetric counts") {
    val r = Multimodal.phashNearDup(Multimodal.mediaTable(spark, sf)).cache()
    val images = Multimodal.mediaTable(spark, sf).filter(col("kind") === "image").count()
    val variants = r.where(col("media_id") >= Multimodal.VariantOffset).count()
    assert(r.count() == images + variants, "one signature row per original + planted variant")
    assert(variants > 0)
    // every planted variant differs from its original by one quantization
    // bit plus data-dependent mean-bit flips; with the corpus margins all
    // 17 land within the threshold — and matches must be symmetric
    val near = r.where(col("n_near") > 0).count()
    assert(near >= 2 * variants, s"variants unmatched: $near matched rows for $variants variants")
    r.unpersist()
  }

  test("lumHistogram: hand-binned pixels over a real PNG; bins partition every image") {
    import graft.operators.ImageCodec
    // 4×5 = 20 pixels: 16 head bytes bin by value/64, 4 gray(100) → bin 1
    val head = Array[Int](0, 63, 64, 127, 128, 191, 192, 255,
      10, 70, 130, 200, 255, 0, 64, 192).map(_.toByte)
    val png = ImageCodec.encodePng(4, 5, head, 100)
    val h = ImageCodec.lumHistogram(png, Multimodal.HistBins, 1L)
    // head: bin0 {0,63,10,0}=4, bin1 {64,127,70,64}=4, bin2 {128,191,130}=3,
    // bin3 {192,255,200,255,192}=5; +4 gray(100)→bin1
    assert(h.toSeq == Seq(4L, 8L, 3L, 5L), h.toSeq.toString)
    assert(h.sum == 20L)
    // corpus: bins partition each image's pixel count
    val r = Multimodal.lumHistogramSummary(Multimodal.mediaTable(spark, sf)).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val total = row.getLong(1) + row.getLong(2) + row.getLong(3) + row.getLong(4)
      assert(total > 0, row.toString)
    }
  }

  test("silenceRuns: hand-counted islands over real PCM, tail merges with a silent head run") {
    import graft.operators.AudioCodec
    // flags (T=2048 ⇒ head silent iff |b−128|<32): s.sss.ss..ss..s. + tail
    val head = Array[Int](100, 200, 128, 128, 128, 50, 97, 159, 96, 160,
      131, 131, 200, 200, 140, 90).map(_.toByte)
    val wav = AudioCodec.encodeWav(20, head, 1) // tail amp 32 → silent
    assert(AudioCodec.silenceRuns(wav, Multimodal.SilenceT, 1L) == ((20, 13L, 6L, 4L)))
    // last head sample silent → the 4-sample tail MERGES into its run
    val head2 = head.clone(); head2(15) = 130.toByte
    val wav2 = AudioCodec.encodeWav(20, head2, 0)
    assert(AudioCodec.silenceRuns(wav2, Multimodal.SilenceT, 2L) == ((20, 14L, 5L, 6L)))
    // corpus invariants over the real media table
    val r = Multimodal.silenceSummary(Multimodal.mediaTable(spark, sf))
    val rows = r.collect()
    assert(rows.nonEmpty)
    rows.foreach { row =>
      val (n, sil, runs, lg) = (row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
      assert(sil <= n && lg <= sil && (runs == 0) == (sil == 0), row.toString)
      assert(lg * runs >= sil, "longest·runs must cover the silent total")
    }
  }

  test("fingerprint: hand-derived window codes over real PCM; identical PCM shares fp; amp separates") {
    import graft.operators.AudioCodec
    val head = Array.tabulate[Byte](16)(i => (i * 16).toByte)
    // 100 samples, amp 64 (tail |v| = 2048): windows of 64 → w0 = digest
    // sum + 48·2048, w1 (36 samples) = 36·2048 = 73728 → q1 = 1
    val wav = AudioCodec.fingerprint(AudioCodec.encodeWav(100, head, 64), 64, 65536L, 1L)
    val w0 = head.map(b => math.abs((b & 0xff) - 128) * 64L).sum + 48L * 2048
    val expect = math.min(3L, w0 / 65536) | (1L << 2)
    assert(wav == ((2, expect)), s"got $wav want (2,$expect)")
    // identical PCM → identical fp; different amp level → different fp
    val a = AudioCodec.fingerprint(AudioCodec.encodeWav(300, head, 100), 64, 65536L, 2L)
    val b = AudioCodec.fingerprint(AudioCodec.encodeWav(300, head, 100), 64, 65536L, 3L)
    val c = AudioCodec.fingerprint(AudioCodec.encodeWav(300, head, 40), 64, 65536L, 4L)
    assert(a == b && a != c)
    // corpus: group counts are consistent with the fp column
    val r = Multimodal.audioFingerprint(Multimodal.mediaTable(spark, sf)).collect()
    assert(r.nonEmpty)
    val byFp = r.groupBy(_.getLong(2)).view.mapValues(_.length.toLong).toMap
    r.foreach(row => assert(row.getLong(3) == byFp(row.getLong(2)), row.toString))
  }
}
