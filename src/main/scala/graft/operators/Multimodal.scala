package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, processed in partition-local batches.
  *
  * The Spark-side plumbing — schema, partitioning, batch shape — is real and
  * tested; the actual media decode is STUBBED (this container has no
  * image/audio libraries): [[StubDecoder.decode]] is a deterministic fake
  * that a real deployment replaces with an actual decoder (e.g. JNI/FFI to
  * libjpeg/ffmpeg) without touching any of the distribution logic.
  *
  * Scale design: decode runs via `mapPartitions` so each task amortizes
  * decoder initialization over its whole partition (the same batch shape
  * Python pipelines get from mapInPandas); payload bytes never leave their
  * partition, and the feature output is narrow (id + small vector), so the
  * expensive stage is shuffle-free.
  */
object Multimodal {

  /** An opaque media record: payload + typed metadata. */
  case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte],
      width: Int, height: Int)

  /** Decoded, feature-extracted output: narrow row per media item. The
    * checksum is the payload md5 — real ingest pipelines stamp one per blob
    * so downstream stages can detect corruption without re-reading bytes.
    */
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Int,
      frames_sampled: Int, checksum: String, features: Array[Float])

  /** The decode seam. REAL deployments swap this object out. */
  object StubDecoder {
    /** Deterministic fake "decode + feature extract": an 8-bin byte
      * histogram normalized by payload length. Stands in for a real
      * image/audio feature extractor; same signature, same batch usage.
      */
    def decode(payload: Array[Byte]): Array[Float] = {
      val bins = new Array[Float](8)
      var i = 0
      while (i < payload.length) {
        bins((payload(i) & 0xff) >> 5) += 1f
        i += 1
      }
      if (payload.length > 0) {
        var b = 0
        while (b < 8) { bins(b) /= payload.length; b += 1 }
      }
      bins
    }

    /** Deterministic frame sampling stub: every `stride`-th 16-byte slice
      * counts as a "frame".
      */
    def sampleFrames(payload: Array[Byte], stride: Int): Int =
      if (payload.isEmpty) 0 else (payload.length / (16 * stride)).max(1)
  }

  /** Fixed raster geometry for the synthesized image payloads. */
  val ImgW = 16
  val ImgH = 9

  /** Build a media table from the documents fixture: media_type cycling
    * deterministically, metadata derived from content. `image` rows carry a
    * REAL binary-PPM payload (P6 header + RGB raster synthesized from the
    * text bytes — [[Ppm]] genuinely parses it downstream); audio/video rows
    * keep opaque UTF-8 bytes behind the documented decode stub. In
    * production this would be `spark.read.format("binaryFile")` or parquet
    * with a binary column.
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    val mediaType = element_at(array(lit("image"), lit("audio"), lit("video")),
      (col("doc_id") % 3 + 1).cast("int"))
    val isImage = mediaType === "image"
    // raster = first W*H*3 text bytes, space-padded (text is ASCII, so
    // chars == bytes; rpad truncates when longer, pads when shorter)
    val ppm = concat(
      encode(lit(s"P6\n$ImgW $ImgH\n255\n"), "UTF-8"),
      encode(rpad(col("text"), ImgW * ImgH * 3, " "), "UTF-8"))
    docs.select(
        col("doc_id"),
        mediaType.as("media_type"),
        when(isImage, ppm).otherwise(encode(col("text"), "UTF-8")).as("payload"),
        when(isImage, lit(ImgW)).otherwise((col("n_chars") % 640).cast("int")).as("width"),
        when(isImage, lit(ImgH)).otherwise((col("n_chars") % 480).cast("int")).as("height"))
      .as[MediaRecord]
  }

  /** The partition-batched decode stage. One decoder per partition, reused
    * across the whole batch — the mapInPandas shape, in Scala. Dispatch by
    * media_type: `image` payloads go through the REAL [[Ppm]] parser,
    * audio/video through the documented [[StubDecoder]] seam.
    */
  def decodeFeatures(media: Dataset[MediaRecord], frameStride: Int = 4): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      // per-partition init of the decoder + digest happens here
      val md = java.security.MessageDigest.getInstance("MD5")
      records.map { r =>
        md.reset()
        val hex = md.digest(r.payload).map("%02x".format(_)).mkString
        val feats =
          if (r.media_type == "image") Ppm.decode(r.payload)
          else StubDecoder.decode(r.payload)
        MediaFeatures(r.doc_id, r.media_type, r.payload.length,
          StubDecoder.sampleFrames(r.payload, frameStride), hex, feats)
      }
    }
  }

  /** 64-bit difference hash (dHash) of an image: the decode -> 9×8
    * nearest-neighbor downsample -> integer grayscale -> 64
    * horizontal-gradient sign bits pipeline every perceptual image dedup
    * runs. Bit y·8+x is set when gray(x+1, y) > gray(x, y) — gradient
    * SIGNS survive re-encoding, scaling, and brightness shifts that break
    * exact byte hashes, which is the point. Same partition-local batch
    * shape as [[thumbnails]] (decoder reuse; the real libjpeg-style
    * decoder would amortize the same way).
    */
  case class PhashRecord(doc_id: Long, phash: Long)

  def dHash64(media: Dataset[MediaRecord]): Dataset[PhashRecord] = {
    import media.sparkSession.implicits._
    media.filter(col("media_type") === "image").mapPartitions { records =>
      records.map { r =>
        val img = Ppm.resizeNearest(Ppm.parse(r.payload), 9, 8)
        def gray(px: Int, py: Int): Int = {
          val o = (py * 9 + px) * 3
          ((img.pixels(o) & 0xff) + (img.pixels(o + 1) & 0xff) +
            (img.pixels(o + 2) & 0xff)) / 3
        }
        var hash = 0L
        var bit = 0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            if (gray(x + 1, y) > gray(x, y)) hash |= 1L << bit
            bit += 1
            x += 1
          }
          y += 1
        }
        PhashRecord(r.doc_id, hash)
      }
    }
  }

  case class ChannelStats(doc_id: Long, channel: Int, psum: Long,
      psumsq: Long, mean_fp: Long, var_fp: Long, too_dark: Boolean,
      low_contrast: Boolean)

  /** Per-channel image statistics through the REAL [[Ppm]] decode — the
    * brightness/contrast curation gate a vision pipeline runs before
    * training (too-dark and near-flat images carry no signal and skew
    * normalization): exact integer Σbyte / Σbyte² per channel, mean and
    * population variance as 1e6 fixed-point, flags on the fixed-point
    * values so both engines compare identical integers.
    *
    * Exactness at ANY decodable raster, not just the fixture's 16×9: the
    * accumulators Σb / Σb² are Long (exact up to ~2^45 pixels, far past
    * any allocatable raster), but the variance numerator n·Σb² − (Σb)²
    * overflows a Long above ~24k pixels, so the products run in BigInt
    * and the final fixed-point values convert with `longValueExact` —
    * mean ≤ 255e6 and population variance ≤ (255²/4)e6 always fit, and
    * anything violating that contract fails LOUDLY instead of shipping a
    * silently-wrapped statistic. `n` is computed in Long (an Int
    * width×height product could wrap on an adversarial header before
    * Ppm.parse's length check caught it).
    * Partition-local decode, zero shuffle before the caller's sort.
    */
  def channelStats(media: Dataset[MediaRecord], darkMeanFp: Long,
      flatVarFp: Long): Dataset[ChannelStats] = {
    import media.sparkSession.implicits._
    media.filter(col("media_type") === "image").flatMap { r =>
      val img = Ppm.parse(r.payload)
      val n = img.width.toLong * img.height
      require(n > 0 && 3 * n == img.pixels.length,
        s"raster ${img.width}x${img.height} does not match payload length " +
          s"${img.pixels.length}")
      // pixels.length fits an Int, so nI and every i*3+c index do too
      val nI = n.toInt
      (0 until 3).map { c =>
        var s = 0L
        var sq = 0L
        var i = 0
        while (i < nI) {
          val b = (img.pixels(i * 3 + c) & 0xff).toLong
          s += b
          sq += b * b
          i += 1
        }
        val meanFp = (BigInt(s) * 1000000L / n).bigInteger.longValueExact()
        val varFp = ((BigInt(n) * sq - BigInt(s) * s) * 1000000L /
          (BigInt(n) * n)).bigInteger.longValueExact()
        ChannelStats(r.doc_id, c, s, sq, meanFp, varFp,
          meanFp < darkMeanFp, varFp < flatVarFp)
      }
    }
  }

  /** Thumbnail output row: geometry + exact channel sums + the md5 of the
    * re-encoded thumbnail PPM, so the oracle pins the exact bytes of the
    * resized image, not just aggregates.
    */
  case class ThumbFeatures(doc_id: Long, thumb_w: Int, thumb_h: Int,
      tsum_r: Long, tsum_g: Long, tsum_b: Long, thumb_md5: String)

  /** Image resize stage: decode (REAL [[Ppm]] parse) -> nearest-neighbor
    * downsample -> re-encode, in partition-local batches like
    * [[decodeFeatures]]. Audio/video rows are filtered out up front (the
    * filter is a Column predicate, so it prunes before deserialization).
    */
  def thumbnails(media: Dataset[MediaRecord], tw: Int, th: Int): Dataset[ThumbFeatures] = {
    import media.sparkSession.implicits._
    media.filter(col("media_type") === "image").mapPartitions { records =>
      val md = java.security.MessageDigest.getInstance("MD5")
      records.map { r =>
        val thumb = Ppm.resizeNearest(Ppm.parse(r.payload), tw, th)
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < thumb.pixels.length) {
          sr += thumb.pixels(i) & 0xff
          sg += thumb.pixels(i + 1) & 0xff
          sb += thumb.pixels(i + 2) & 0xff
          i += 3
        }
        md.reset()
        val hex = md.digest(Ppm.encode(tw, th, thumb.pixels, thumb.maxVal))
          .map("%02x".format(_)).mkString
        ThumbFeatures(r.doc_id, tw, th, sr, sg, sb, hex)
      }
    }
  }

  /** Distributed opaque-file writer: each task writes its partition's
    * payloads as individual `<doc_id>.bin` files — the one-blob-per-object
    * layout `binaryFile` sources (and real media lakes) expect.
    *
    * Cluster-portable by construction: all I/O goes through the Hadoop
    * `FileSystem` resolved from `dir`'s scheme, so `dir` may be local
    * (tests), `hdfs://…`, or `s3a://…` — each executor opens the filesystem
    * from the broadcast Hadoop conf and streams only its own partition;
    * nothing funnels through the driver.
    */
  def writeBinaryFiles(media: Dataset[MediaRecord], dir: String): Unit = {
    import org.apache.hadoop.fs.Path
    val sc = media.sparkSession.sparkContext
    val hconf = new org.apache.spark.util.SerializableConfiguration(sc.hadoopConfiguration)
    new Path(dir).getFileSystem(hconf.value).mkdirs(new Path(dir))
    // File creation is latency-bound (~ms per object on local FS and object
    // stores alike), so per-file cost amortizes ONLY across tasks. A
    // narrow upstream (e.g. one parquet file) would serialize the whole
    // write through one task — 47 s for 5k files measured — so spread it to
    // the cluster's parallelism first; an already-wide upstream keeps its
    // partitioning (the repartition shuffle is payload-sized but one-pass,
    // and at scale the upstream is wide and the branch never fires).
    val spread =
      if (media.rdd.getNumPartitions < sc.defaultParallelism)
        media.repartition(sc.defaultParallelism)
      else media
    val scheme = new Path(dir).toUri.getScheme
    if (scheme == null || scheme == "file") {
      // Local-scheme fast path: Hadoop's LocalFileSystem pays ~4x per small
      // file over java.io (measured 10.4 s vs 2.2 s per 156-file partition
      // — checksum siblings plus per-file permission ops that shell out
      // when libhadoop isn't loaded). Plain java.io hits the kernel
      // directly; the layout on disk is identical.
      val localRoot = new Path(dir).toUri.getPath
      spread.foreachPartition { (records: Iterator[MediaRecord]) =>
        // The driver-side mkdirs above ran on the DRIVER's filesystem; with
        // a `file:` target on a real cluster each executor writes to its own
        // local disk, so the directory must also exist task-side (and
        // java.io.FileOutputStream, unlike fs.create, never creates parents).
        new java.io.File(localRoot).mkdirs()
        records.foreach { r =>
          val f = new java.io.FileOutputStream(
            new java.io.File(localRoot, f"${r.doc_id}%012d.bin"))
          try f.write(r.payload) finally f.close()
        }
      }
    } else spread.foreachPartition { (records: Iterator[MediaRecord]) =>
      // Remote schemes (hdfs://, s3a://): a PRIVATE FileSystem instance
      // (not the JVM-cached shared one) — we disable per-file checksum
      // siblings (.crc doubles create latency; integrity is pinned
      // downstream by the per-payload md5), and that flag must not leak
      // into Spark's own commit/sink writes that share the cached FS in
      // this executor JVM.
      val fs = org.apache.hadoop.fs.FileSystem.newInstance(
        new Path(dir).toUri, hconf.value)
      try {
        fs.setWriteChecksum(false)
        records.foreach { r =>
          val out = fs.create(new Path(dir, f"${r.doc_id}%012d.bin"), true)
          try out.write(r.payload) finally out.close()
        }
      } finally fs.close()
    }
  }

  /** Media records from a directory of genuinely opaque files via Spark's
    * `binaryFile` source: one row per file, payload = raw bytes, identity
    * parsed from the file name (media_type keyed off doc_id exactly like
    * [[mediaFromDocuments]] so the two sources are interchangeable).
    */
  def fromBinaryFiles(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    val docId = regexp_extract(col("path"), "(\\d+)\\.bin$", 1).cast("long")
    spark.read.format("binaryFile").option("pathGlobFilter", "*.bin").load(dir)
      .select(
        docId.as("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (docId % 3 + 1).cast("int")).as("media_type"),
        col("content").as("payload"),
        lit(0).as("width"), lit(0).as("height"))
      .as[MediaRecord]
  }

  // ---- audio path: a REAL parsed payload format, like Ppm for images ----

  /** Synthesized PCM geometry: sample count per clip and the analysis
    * window. 512 samples / 64-sample windows = 8 windows per clip.
    */
  val PcmN = 512
  val PcmWin = 64

  /** A window is "silent" below this exact integer energy. The synthetic
    * clips are bias-32 (space = zero amplitude), so runs of
    * padding/whitespace are genuinely silent and text is signal — the
    * same shape real voice-activity trimming sees.
    */
  val PcmSilenceThr = 1024L

  /** Minimal single-channel PCM container, the audio twin of [[Ppm]]:
    * ASCII header `PCM\n<n>\n` followed by exactly n unsigned-byte
    * samples. The parser genuinely validates and strips the header — the
    * decode seam a real codec (libsndfile etc.) would fill.
    */
  object Pcm {
    def encodeHeader(n: Int): Array[Byte] = s"PCM\n$n\n".getBytes("UTF-8")

    /** Parse and validate; returns the raw sample bytes. */
    def parse(payload: Array[Byte]): Array[Byte] = {
      val s = new String(payload, "UTF-8")
      require(s.startsWith("PCM\n"), "bad PCM magic")
      val nl = s.indexOf('\n', 4)
      require(nl > 4, "bad PCM header")
      val n = s.substring(4, nl).toInt
      val off = nl + 1
      require(payload.length == off + n,
        s"PCM payload length ${payload.length} != header $n + $off")
      java.util.Arrays.copyOfRange(payload, off, off + n)
    }
  }

  /** Audio records synthesized from the documents fixture: the audio-typed
    * third of the corpus (same doc_id % 3 cycling as
    * [[mediaFromDocuments]]) carries a REAL [[Pcm]] payload — header plus
    * the first [[PcmN]] text bytes as bias-32 samples, space-padded, so
    * [[Pcm.parse]] genuinely exercises the container on every row.
    */
  def audioFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.filter(col("doc_id") % 3 === 1)
      .select(
        col("doc_id"),
        lit("audio").as("media_type"),
        concat(lit(Pcm.encodeHeader(PcmN)),
          encode(rpad(col("text"), PcmN, " "), "UTF-8")).as("payload"),
        lit(PcmN).as("width"), lit(1).as("height"))
      .as[MediaRecord]
  }

  /** Windowed-energy audio features: integer energy Σ(sample-32)² per
    * fixed window — exact in both engines, no float drift — plus how many
    * windows fall below the silence threshold (the voice-activity /
    * silence-trim signal). Same partition-local batch shape as the image
    * stages: parse is per-record, a real decoder would amortize per
    * partition.
    */
  case class AudioFeatures(doc_id: Long, n_samples: Int, n_windows: Int,
      total_energy: Long, peak_energy: Long, n_silent: Int)

  def audioEnergy(media: Dataset[MediaRecord], window: Int,
                  silenceThr: Long): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.filter(col("media_type") === "audio").mapPartitions { records =>
      records.map { r =>
        val samples = Pcm.parse(r.payload)
        val nw = samples.length / window
        var total = 0L; var peak = 0L; var silent = 0
        var w = 0
        while (w < nw) {
          var e = 0L
          var j = 0
          while (j < window) {
            val d = (samples(w * window + j) & 0xff) - 32
            e += d.toLong * d
            j += 1
          }
          total += e
          if (e > peak) peak = e
          if (e < silenceThr) silent += 1
          w += 1
        }
        AudioFeatures(r.doc_id, samples.length, nw, total, peak, silent)
      }
    }
  }

  /** Silence TRIMMING — the repair step after [[audioEnergy]]'s detection
    * (the audio twin of t23's substring trimming): windows whose integer
    * energy falls below the threshold are REMOVED and the surviving
    * windows re-concatenated in order — the cleaned signal a speech
    * pipeline feeds to its (stubbed) transcriber. The tail short of a full
    * window is dropped with the silent windows (windowing defines the
    * unit, same as [[audioEnergy]] ignoring it). The md5 pins the exact
    * surviving bytes, so a trim that shifted, reordered, or re-encoded a
    * window cannot pass the oracle. Same embarrassingly parallel
    * mapPartitions shape as every decode stage — no shuffle.
    */
  case class TrimmedAudio(doc_id: Long, n_windows: Int, n_kept: Int,
      kept_bytes: Int, trimmed_md5: String)

  def audioSilenceTrim(media: Dataset[MediaRecord], window: Int,
      silenceThr: Long): Dataset[TrimmedAudio] = {
    import media.sparkSession.implicits._
    media.filter(col("media_type") === "audio").mapPartitions { records =>
      // one digest instance per partition — per-record allocation is the
      // kind of cost a million-record partition amortizes away
      val md = java.security.MessageDigest.getInstance("MD5")
      records.map { r =>
        val samples = Pcm.parse(r.payload)
        val nw = samples.length / window
        val out = new java.io.ByteArrayOutputStream(samples.length)
        var kept = 0
        var w = 0
        while (w < nw) {
          var e = 0L
          var j = 0
          while (j < window) {
            val d = (samples(w * window + j) & 0xff) - 32
            e += d.toLong * d
            j += 1
          }
          if (e >= silenceThr) {
            out.write(samples, w * window, window)
            kept += 1
          }
          w += 1
        }
        val bytes = out.toByteArray
        md.reset()
        val hex = md.digest(bytes).map("%02x".format(_)).mkString
        TrimmedAudio(r.doc_id, nw, kept, bytes.length, hex)
      }
    }
  }

  // ---- video path: a multi-frame parsed container + scene detection ----

  /** Synthesized clip geometry: 6 frames of 16×9 single-channel gray. */
  val VidW = 16
  val VidH = 9
  val VidFrames = 6
  val VidFrameBytes: Int = VidW * VidH

  /** Consecutive frames whose sum-of-absolute-differences exceeds this are
    * a scene cut. Sized so text-vs-text and text-vs-padding transitions
    * register as cuts while the space-padded still tail (SAD = 0) never
    * does — the shot-boundary shape real frame differencing sees.
    */
  val SceneCutThr = 1000L

  /** Minimal multi-frame video container, the moving-picture twin of
    * [[Pcm]]/[[Ppm]]: ASCII header `VID\n<w> <h> <nframes>\n` followed by
    * nframes × w·h unsigned gray bytes, frame-major. The parser genuinely
    * validates geometry against payload length — the seam a real demuxer
    * (ffmpeg etc.) would fill.
    */
  object Vid {
    case class Clip(w: Int, h: Int, nFrames: Int, frames: Array[Byte])

    def encodeHeader(w: Int, h: Int, n: Int): Array[Byte] =
      s"VID\n$w $h $n\n".getBytes("UTF-8")

    def parse(payload: Array[Byte]): Clip = {
      val s = new String(payload, "UTF-8")
      require(s.startsWith("VID\n"), "bad VID magic")
      val nl = s.indexOf('\n', 4)
      require(nl > 4, "bad VID header")
      val dims = s.substring(4, nl).split(" ")
      require(dims.length == 3, "bad VID geometry")
      val (w, h, n) = (dims(0).toInt, dims(1).toInt, dims(2).toInt)
      val off = nl + 1
      require(payload.length == off + w * h * n,
        s"VID payload length ${payload.length} != $w x $h x $n + $off")
      Clip(w, h, n, java.util.Arrays.copyOfRange(payload, off, payload.length))
    }
  }

  /** Video records synthesized from the documents fixture: the video-typed
    * third of the corpus (doc_id % 3 == 2, same cycling as
    * [[mediaFromDocuments]]) carries a REAL [[Vid]] payload — header plus
    * the first VidFrames·w·h text bytes as gray frames, space-padded, so
    * every row exercises the container parse.
    */
  def videoFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    val body = VidFrames * VidFrameBytes
    docs.filter(col("doc_id") % 3 === 2)
      .select(
        col("doc_id"),
        lit("video").as("media_type"),
        concat(lit(Vid.encodeHeader(VidW, VidH, VidFrames)),
          encode(rpad(col("text"), body, " "), "UTF-8")).as("payload"),
        lit(VidW).as("width"), lit(VidH).as("height"))
      .as[MediaRecord]
  }

  /** Frame-differencing scene detection: integer SAD Σ|gray(f,i)−gray(f−1,i)|
    * between consecutive frames — exact in both engines — and a cut wherever
    * SAD exceeds the threshold. This is the classic shot-boundary detector
    * every video curation pipeline runs before sampling keyframes; the
    * still space-padded tail is SAD-0 by construction, so cut counts measure
    * genuine content transitions. Embarrassingly parallel partition-local
    * decode, no shuffle before the output sort.
    */
  case class SceneFeatures(doc_id: Long, n_frames: Int, n_cuts: Int,
      total_diff: Long, max_diff: Long)

  /** One representative keyframe per clip: the frame AFTER the largest
    * inter-frame SAD transition (ties → lowest frame index — "first frame
    * strictly greater" in the fold below, row_number in the oracle). This
    * is the step a curation pipeline runs right after [[sceneDetect]]:
    * shot boundaries say WHERE content changes, the keyframe is the still
    * that represents the clip in previews, dedup indexes, and
    * vision-encoder sampling. kf_md5 hashes the frame's RAW gray bytes, so
    * the gate catches a one-byte drift anywhere in parse→diff→argmax→
    * extract. Scale shape: identical to sceneDetect — embarrassingly
    * parallel partition-local decode, zero shuffle before the output sort.
    */
  case class KeyframeRecord(doc_id: Long, kf_frame: Int, kf_sad: Long,
      kf_md5: String)

  def keyframes(media: Dataset[MediaRecord]): Dataset[KeyframeRecord] = {
    import media.sparkSession.implicits._
    media.filter(col("media_type") === "video").mapPartitions { records =>
      val md = java.security.MessageDigest.getInstance("MD5")
      records.map { r =>
        val clip = Vid.parse(r.payload)
        val fb = clip.w * clip.h
        var bestF = 1; var bestSad = -1L
        var f = 1
        while (f < clip.nFrames) {
          var sad = 0L
          var i = 0
          while (i < fb) {
            sad += math.abs((clip.frames(f * fb + i) & 0xff) -
              (clip.frames((f - 1) * fb + i) & 0xff))
            i += 1
          }
          if (sad > bestSad) { bestSad = sad; bestF = f }
          f += 1
        }
        md.reset()
        val dig = md.digest(java.util.Arrays.copyOfRange(
          clip.frames, bestF * fb, (bestF + 1) * fb))
        KeyframeRecord(r.doc_id, bestF, bestSad,
          dig.map("%02x".format(_)).mkString)
      }
    }
  }

  def sceneDetect(media: Dataset[MediaRecord], cutThr: Long): Dataset[SceneFeatures] = {
    import media.sparkSession.implicits._
    media.filter(col("media_type") === "video").mapPartitions { records =>
      records.map { r =>
        val clip = Vid.parse(r.payload)
        val fb = clip.w * clip.h
        var total = 0L; var mx = 0L; var cuts = 0
        var f = 1
        while (f < clip.nFrames) {
          var sad = 0L
          var i = 0
          while (i < fb) {
            sad += math.abs((clip.frames(f * fb + i) & 0xff) -
              (clip.frames((f - 1) * fb + i) & 0xff))
            i += 1
          }
          total += sad
          if (sad > mx) mx = sad
          if (sad > cutThr) cuts += 1
          f += 1
        }
        SceneFeatures(r.doc_id, clip.nFrames, cuts, total, mx)
      }
    }
  }
}
