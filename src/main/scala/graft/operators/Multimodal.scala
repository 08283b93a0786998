package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Multimodal-column plumbing (SURVEY.md §2.9 L5 / builder mandate):
  * image/audio/video as opaque `binary` columns with typed metadata,
  * processed in partition-local batches.
  *
  * ALL THREE kinds now decode REAL payloads through JDK codecs: PNG
  * pixels via `javax.imageio` ([[decodePng]], q39), WAV PCM via
  * `javax.sound.sampled` ([[decodeWav]], q159), and multi-frame
  * animated GIF via `javax.imageio`'s sequence reader ([[decodeGif]],
  * q160 — the VIDEO kind; GIF with a full 256-gray palette is lossless,
  * so frames round-trip exactly). The DETERMINISTIC STUB (`decodeStub`)
  * remains only as the fallback arm for payloads no JDK codec claims
  * (the plain-bytes fixture rows); [[decodeKernel]] dispatches on the
  * payload's magic bytes, so swapping any arm for an external codec
  * (ffmpeg/libvips) changes nothing outside this file. Everything around the kernels — binary columns, metadata
  * struct, typed Dataset encoders, mapPartitions batching,
  * partition-by-kind layout — is the real 100 TB plumbing: executors
  * stream batches of byte arrays, never the driver; feature vectors come
  * out as ArrayType(FloatType) compatible with the Similarity operators.
  */
object Multimodal {

  /** Typed metadata carried next to the opaque payload. */
  case class MediaMeta(kind: String, n_bytes: Long, checksum: Long)
  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
                      meta: MediaMeta)
  case class MediaFeature(media_id: Long, kind: String, width: Int,
                          height: Int, embedding: Array[Float])

  /** Build a media table from `documents` — deterministic fake payloads
    * (UTF-8 bytes of the text, kind derived from doc_id) standing in for
    * real image/audio blobs. The column types and layout are the
    * production shape. */
  def mediaFromDocuments(spark: SparkSession, dir: String,
                         only: Option[String] = None): Dataset[MediaRow] = {
    import spark.implicits._
    val base = Tables.documents(spark, dir)
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("bytes"))
    // `only` prunes BEFORE the typed maps: a single-kind consumer (q159
    // reads audio, q160 video) must not pay the other kinds' payload
    // synthesis — a kind filter AFTER mediaWithCodecs runs inside the
    // row-by-row map and still encodes every payload (the r11 q159
    // regression: adding GIF synthesis for video rows cost the
    // audio-only query 1.6x until this pushdown).
    only.fold(base)(k => base.where(col("kind") === k))
      .as[(Long, String, Array[Byte])]
      .map { case (id, kind, bytes) =>
        MediaRow(id, kind, bytes,
          MediaMeta(kind, bytes.length.toLong,
            bytes.foldLeft(0L)((a, b) => a + (b & 0xff))))
      }
  }

  // ----------------------------------------------------------------
  // STUB (fallback arm only): payloads no JDK codec claims — the
  // plain-bytes fixture rows — go through this deterministic fake with
  // the exact signature and per-batch call shape a real kernel has.
  // PNG, WAV, and animated-GIF payloads all decode REAL bytes above it.
  // ----------------------------------------------------------------
  private[operators] def decodeStub(bytes: Array[Byte], dim: Int): (Int, Int, Array[Float]) = {
    val w = 16 + (bytes.length % 64)          // fake "decoded" dimensions
    val h = 16 + ((bytes.length / 64) % 64)
    val emb = new Array[Float](dim)           // fake features: byte histogram folded to dim
    var i = 0
    while (i < bytes.length) { emb(i % dim) += (bytes(i) & 0xff) / 255.0f; i += 1 }
    (w, h, emb)
  }

  /** PNG magic bytes — what [[decodeKernel]] dispatches on. */
  private val PngMagic = Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)

  private[graft] def isPng(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && bytes(0) == PngMagic(0) && bytes(1) == PngMagic(1) &&
      bytes(2) == PngMagic(2) && bytes(3) == PngMagic(3)

  /** REAL image decode via the JDK's PNG codec (`javax.imageio` — no
    * external dependency): payload → actual pixel raster. Features are a
    * normalized luminance fold: pixel (x, y)'s luma (0.2126 R + 0.7152 G
    * + 0.0722 B, the BT.709 weights) accumulates into bin
    * `(y * width + x) % dim`. Deterministic because PNG is lossless —
    * whatever encoder wrote the bytes, the decoded raster (and therefore
    * the feature vector) is exact. */
  private[graft] def decodePng(bytes: Array[Byte], dim: Int): (Int, Int, Array[Float]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "ImageIO could not decode payload claimed to be PNG")
    val w = img.getWidth
    val h = img.getHeight
    val emb = new Array[Float](dim)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val luma = 0.2126f * ((rgb >> 16) & 0xff) +
          0.7152f * ((rgb >> 8) & 0xff) + 0.0722f * (rgb & 0xff)
        emb((y * w + x) % dim) += luma / 255.0f
        x += 1
      }
      y += 1
    }
    (w, h, emb)
  }

  /** Deterministic tiny-PNG generator for the media fixture: a `w`×`h`
    * RGB raster whose pixel values mix (seed, x, y) through a 64-bit LCG,
    * encoded with the JDK PNG writer. Pixels (not bytes) are the
    * determinism contract — PNG is lossless, so decode(encode(p)) == p
    * regardless of encoder version. */
  private[graft] def encodePng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val m = seed * 6364136223846793005L + (x * 2862933555777941757L) +
          (y * 3202034522624059733L) + 1442695040888963407L
        img.setRGB(x, y, ((m >>> 16) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** RIFF/WAVE magic — what [[decodeKernel]] dispatches on for audio. */
  private[graft] def isWav(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'

  /** REAL audio decode via the JDK's WAV codec (`javax.sound.sampled` —
    * no external dependency, the audio sibling of [[decodePng]]): payload
    * → actual PCM samples. Expects the fixture contract (16-bit signed
    * mono little-endian — what [[encodeWav]] writes; a codec-zoo binding
    * would transcode other layouts at this same boundary). Features fold
    * the REAL samples: sample i's amplitude (normalized to [-1, 1))
    * accumulates into bin `i % dim`. For audio the MediaFeature
    * (width, height) axes carry (sample rate Hz, sample count) — the
    * duration pair. Deterministic because PCM WAV is lossless:
    * decode(encode(samples)) == samples whatever wrote the container. */
  private[graft] def decodeWav(bytes: Array[Byte], dim: Int): (Int, Int, Array[Float]) = {
    val ais = javax.sound.sampled.AudioSystem
      .getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
      !fmt.isBigEndian && fmt.getEncoding ==
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      s"fixture contract is 16-bit signed mono LE PCM, got $fmt")
    val pcm = ais.readAllBytes()
    val n = pcm.length / 2
    val emb = new Array[Float](dim)
    var i = 0
    while (i < n) {
      val s = (((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort)
      emb(i % dim) += s / 32768.0f
      i += 1
    }
    (fmt.getSampleRate.toInt, n, emb)
  }

  /** Deterministic WAV generator for the media fixture (the audio
    * sibling of [[encodePng]]): `nSamples` 16-bit mono samples at
    * `sampleRate` Hz, each mixed from (seed, i) through a 64-bit LCG,
    * written through the JDK WAV encoder. Samples (not container bytes)
    * are the determinism contract — PCM is lossless, so
    * decode(encode(s)) == s regardless of encoder version. */
  private[graft] def encodeWav(seed: Long, sampleRate: Int,
                               nSamples: Int): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val m = seed * 6364136223846793005L + i * 3202034522624059733L +
        1442695040888963407L
      val s = ((m >>> 24) & 0xffffL).toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false) // signed, little-endian
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** GIF87a/GIF89a magic — what [[decodeKernel]] dispatches on for
    * video (animated GIF is the one multi-frame container the JDK
    * decodes). */
  private[graft] def isGif(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 &&
      bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8'

  /** Exact 256-level gray palette: r == g == b == index, so a GIF
    * frame's decoded getRGB channels recover the written sample bit-for-
    * bit (an RGB raster would be quantized by the GIF writer — lossy;
    * the identity palette is what makes decode(encode(f)) == f hold). */
  private def grayPalette: java.awt.image.IndexColorModel = {
    val ramp = Array.tabulate(256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
  }

  /** Deterministic animated-GIF generator for the media fixture (the
    * video sibling of [[encodePng]]/[[encodeWav]]): `nFrames` frames of
    * `w`×`h` 8-bit gray, each pixel mixed from (seed, frame, x, y)
    * through a 64-bit LCG, written as ONE multi-image GIF through the
    * JDK's sequence writer. Frame pixels (not container bytes) are the
    * determinism contract — with the identity gray palette GIF is
    * lossless, so decode(encode(frames)) == frames regardless of
    * encoder version. */
  private[graft] def encodeGif(seed: Long, w: Int, h: Int,
                               nFrames: Int): Array[Byte] = {
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < nFrames) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val m = seed * 6364136223846793005L +
            f * -7046029254386353131L + x * 2862933555777941757L +
            y * 3202034522624059733L + 1442695040888963407L
          raster.setSample(x, y, 0, ((m >>> 40) & 0xff).toInt)
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      f += 1
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    baos.toByteArray
  }

  /** REAL video decode via the JDK's GIF sequence reader: payload →
    * every frame's actual raster. Frames written by [[encodeGif]] are
    * full-screen with the identity gray palette, so each decoded frame
    * stands alone (no delta compositing needed at this fixture
    * contract; an ffmpeg binding would composite at this boundary). */
  private[graft] def decodeGifFrames(
      bytes: Array[Byte]): IndexedSeq[java.awt.image.BufferedImage] = {
    val reader = javax.imageio.ImageIO
      .getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      (0 until n).map(reader.read)
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  /** Video feature kernel: folds EVERY frame's luma into the feature
    * bins (pixel (f, x, y) → bin `((f·h + y)·w + x) % dim`), returning
    * frame-0 dimensions in the (width, height) axes — the q39 luma fold
    * extended along the time axis. Frame count is surfaced separately
    * by [[decodeVideoFeatures]]. */
  private[graft] def decodeGif(bytes: Array[Byte], dim: Int): (Int, Int, Array[Float]) =
    gifLumaFold(decodeGifFrames(bytes), dim)

  /** The luma fold of [[decodeGif]] over ALREADY-decoded frames — split
    * out (r12) so [[decodeVideoFeatures]] can decode each payload ONCE
    * for both the frame count and the feature fold (it previously ran
    * the GIF reader twice per row). */
  private[graft] def gifLumaFold(
      frames: IndexedSeq[java.awt.image.BufferedImage],
      dim: Int): (Int, Int, Array[Float]) = {
    val w = frames.head.getWidth
    val h = frames.head.getHeight
    val emb = new Array[Float](dim)
    var f = 0
    while (f < frames.length) {
      val img = frames(f)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val luma = 0.2126f * ((rgb >> 16) & 0xff) +
            0.7152f * ((rgb >> 8) & 0xff) + 0.0722f * (rgb & 0xff)
          emb(((f * h + y) * w + x) % dim) += luma / 255.0f
          x += 1
        }
        y += 1
      }
      f += 1
    }
    (w, h, emb)
  }

  /** The per-payload kernel: REAL PNG decode when the payload carries
    * the PNG magic, REAL WAV decode on RIFF/WAVE, REAL multi-frame GIF
    * decode on GIF87a/GIF89a, deterministic stub otherwise (payloads no
    * JDK codec claims). */
  private[operators] def decodeKernel(bytes: Array[Byte], dim: Int): (Int, Int, Array[Float]) =
    if (isPng(bytes)) decodePng(bytes, dim)
    else if (isWav(bytes)) decodeWav(bytes, dim)
    else if (isGif(bytes)) decodeGif(bytes, dim)
    else decodeStub(bytes, dim)

  /** Decode + feature-extract in partition-local batches: one
    * mapPartitions pass, no shuffle; the iterator IS the batch stream
    * (an Arrow-batched kernel would sit at the same boundary). */
  def decodeFeatures(media: Dataset[MediaRow], dim: Int = 64): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, emb) = decodeKernel(r.bytes, dim)
        MediaFeature(r.media_id, r.kind, w, h, emb)
      }
    }
  }

  // ----------------------------------------------------------------
  // Batch shape: a vectorized codec binding (Arrow FFI, JNI batch call,
  // or a subprocess fed a whole batch) amortizes its per-call overhead
  // across rows. This has that call shape — one invocation per batch of
  // payloads, columnar in/out — dispatching to the same per-payload
  // kernel (real PNG decode or the audio/video stub).
  // ----------------------------------------------------------------
  private[operators] def decodeBatchStub(batch: Array[Array[Byte]], dim: Int): Array[(Int, Int, Array[Float])] =
    batch.map(decodeKernel(_, dim))

  /** [[decodeFeatures]] with an explicitly BATCHED kernel boundary: rows
    * are grouped into fixed-size batches inside each partition and the
    * kernel is called once per batch — the iterator shape `mapInArrow` /
    * `mapInPandas` give Python UDFs, expressed Scala-side. Per-row and
    * per-batch kernels produce identical results (spec-pinned); the batch
    * variant is what a real FFI codec would bind to, since per-row JNI
    * or subprocess calls drown in call overhead at 100 TB. */
  def decodeFeaturesBatched(media: Dataset[MediaRow], dim: Int = 64,
                            batchSize: Int = 256): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { chunk =>
        val out = decodeBatchStub(chunk.map(_.bytes).toArray, dim)
        chunk.lazyZip(out).map { case (r, (w, h, emb)) =>
          MediaFeature(r.media_id, r.kind, w, h, emb)
        }
      }
    }
  }

  // ----------------------------------------------------------------
  // STUB: a real resize is libvips/ffmpeg scale. The fake keeps the
  // kernel signature (payload in → smaller payload out) via fixed-stride
  // subsampling, standing in for pixel/sample resampling.
  // ----------------------------------------------------------------
  private[operators] def resizeStub(bytes: Array[Byte], targetBytes: Int): Array[Byte] =
    if (bytes.length <= targetBytes) bytes
    else {
      val step = bytes.length.toDouble / targetBytes
      Array.tabulate(targetBytes)(i => bytes((i * step).toInt))
    }

  /** Resize/downsample each payload to ≤ targetBytes, recomputing the
    * typed metadata — partition-local like [[decodeFeatures]], no
    * shuffle; output rows keep the MediaRow schema so resize composes
    * with decode/frame-sample stages. */
  def resize(media: Dataset[MediaRow], targetBytes: Int = 1024): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val out = resizeStub(r.bytes, targetBytes)
      r.copy(bytes = out,
        meta = MediaMeta(r.meta.kind, out.length.toLong,
          out.foldLeft(0L)((a, b) => a + (b & 0xff))))
    })
  }

  /** Frame/sample extraction: fixed-stride byte slices standing in for
    * video frame sampling — pure column ops, stays in codegen. */
  def frameSample(media: Dataset[MediaRow], nFrames: Int = 4): DataFrame =
    media.toDF()
      .select(col("media_id"), col("kind"),
        transform(sequence(lit(0), lit(nFrames - 1)),
          i => substring_index(base64(col("bytes")), "=", 1).substr(
            i * lit(8) + 1, lit(8))).as("frames"))

  /** [[mediaFromDocuments]] with REAL payloads for the image kind: every
    * `doc_id % 3 == 0` row carries an actual PNG (deterministic raster
    * from the doc_id via [[encodePng]], dims `8 + id%9` × `8 + id%7`);
    * audio/video rows keep the fake byte payloads. This is the fixture
    * q39 decodes — image features come from real pixels through the JDK
    * codec, not the stub. */
  def mediaWithImages(spark: SparkSession, dir: String,
                      only: Option[String] = None): Dataset[MediaRow] = {
    import spark.implicits._
    mediaFromDocuments(spark, dir, only).map { r =>
      if (r.kind == "image") {
        val bytes = encodePng(r.media_id,
          8 + (r.media_id % 9).toInt, 8 + (r.media_id % 7).toInt)
        r.copy(bytes = bytes,
          meta = MediaMeta("image", bytes.length.toLong,
            bytes.foldLeft(0L)((a, b) => a + (b & 0xff))))
      } else r
    }
  }

  /** [[mediaWithImages]] with REAL payloads for the audio AND video
    * kinds too: every `kind == "audio"` row carries an actual 16-bit
    * mono PCM WAV (deterministic samples from the media_id via
    * [[encodeWav]], rate `8000 · (1 + id%3)` Hz, `32 + id%97` samples),
    * and every `kind == "video"` row an actual animated GIF
    * (deterministic frames via [[encodeGif]], dims `8 + id%9` ×
    * `8 + id%7`, `2 + id%4` frames); image rows keep their real PNGs.
    * This is the fixture q159 and q160 decode — every kind through a
    * real JDK codec. */
  def mediaWithCodecs(spark: SparkSession, dir: String,
                      only: Option[String] = None): Dataset[MediaRow] = {
    import spark.implicits._
    mediaWithImages(spark, dir, only).map { r =>
      if (r.kind == "audio") {
        val bytes = encodeWav(r.media_id,
          8000 * (1 + (r.media_id % 3).toInt), 32 + (r.media_id % 97).toInt)
        r.copy(bytes = bytes,
          meta = MediaMeta("audio", bytes.length.toLong,
            bytes.foldLeft(0L)((a, b) => a + (b & 0xff))))
      } else if (r.kind == "video") {
        val bytes = encodeGif(r.media_id,
          8 + (r.media_id % 9).toInt, 8 + (r.media_id % 7).toInt,
          2 + (r.media_id % 4).toInt)
        r.copy(bytes = bytes,
          meta = MediaMeta("video", bytes.length.toLong,
            bytes.foldLeft(0L)((a, b) => a + (b & 0xff))))
      } else r
    }
  }

  /** Video features with the time axis surfaced: frame count, frame-0
    * dimensions, and the all-frames luma fold — the decoded-video row a
    * training pipeline filters and buckets on. Same partition-local
    * mapPartitions shape as [[decodeFeatures]]; non-GIF rows are
    * dropped (the caller selects the video kind). */
  case class VideoFeature(media_id: Long, n_frames: Int, width: Int,
                          height: Int, embedding: Array[Float])
  def decodeVideoFeatures(media: Dataset[MediaRow],
                          dim: Int = 64): Dataset[VideoFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      if (isGif(r.bytes)) {
        // r12: decode once — frame count and luma fold share the frames
        val frames = decodeGifFrames(r.bytes)
        val (w, h, emb) = gifLumaFold(frames, dim)
        Some(VideoFeature(r.media_id, frames.size, w, h, emb))
      } else None
    })
  }

  /** q36 (declared): metadata projection — the deterministic part of the
    * pipeline, oracled in DuckDB over the same bytes. */
  val q36_media_meta = QueryDef(
    "q36_media_meta",
    """SELECT doc_id AS media_id,
      |  ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(list_filter(regexp_split_to_array(text, ''), c -> length(c) > 0),
      |                   c -> CAST(unicode(c) AS BIGINT))),
      |    (acc, x) -> acc + x) AS checksum
      |FROM documents ORDER BY media_id""".stripMargin) { (s, d) =>
    // kind mapping note: Spark element_at(array('image','audio','video'), doc_id%3+1)
    // vs DuckDB list indexing — both 1-based; fixture text is ASCII so
    // byte checksum == codepoint sum on both engines.
    mediaFromDocuments(s, d).toDF()
      .select(col("media_id"), col("meta.kind").as("kind"),
        col("meta.n_bytes").as("n_bytes"), col("meta.checksum").as("checksum"))
      // hash exchange before the sort (q54 pattern in TextPipeline):
      // range sampling must not re-run the per-byte checksum fold
      .repartition(col("media_id"))
      .orderBy("media_id")
  }

  /** q39: decoded features — image rows decode REAL PNG payloads through
    * the JDK codec (width/height/features from actual pixels; dims are
    * spec-pinned against the [[mediaWithImages]] formula in
    * MultimodalSpec), audio/video rows go through the deterministic
    * stub. No SQL engine can decode PNG, so the driver records a
    * rows-only check; determinism is the spec's job. */
  val q39_media_features = QueryDef.unchecked("q39_media_features") { (s, d) =>
    decodeFeatures(mediaWithImages(s, d)).toDF()
      .select(col("media_id"), col("kind"), col("width"), col("height"),
        round(aggregate(col("embedding"),
          lit(0.0d), (a, x) => a + x.cast("double")), 4).as("emb_sum"))
      .orderBy("media_id")
  }

  /** q159: decoded AUDIO features — the q39 pattern with the audio stub
    * demoted to a real kernel (VERDICT r9 #4): WAV payloads decode to
    * actual PCM through `javax.sound.sampled`, and the output carries
    * the decoded sample rate, sample count, duration, and the real-
    * sample amplitude fold. No SQL engine can decode WAV, so the driver
    * records a rows-only check; sample-rate/duration determinism and
    * decode(encode(s)) == s are MultimodalSpec's job. */
  val q159_audio_features = QueryDef.unchecked("q159_audio_features") { (s, d) =>
    decodeFeatures(mediaWithCodecs(s, d, only = Some("audio"))).toDF()
      .select(col("media_id"),
        col("width").as("sample_rate"),
        col("height").as("n_samples"),
        round(col("height") * lit(1000.0) / col("width"), 4).as("dur_ms"),
        round(aggregate(col("embedding"),
          lit(0.0d), (a, x) => a + x.cast("double")), 4).as("emb_sum"))
      .orderBy("media_id")
  }

  /** q160: decoded VIDEO features — the q39→q159 pattern completed
    * (VERDICT r10 #4): animated-GIF payloads decode to actual frame
    * rasters through the JDK's GIF sequence reader, and the output
    * carries the real frame count, frame dimensions, and the all-frames
    * luma fold. No SQL engine can decode GIF, so the driver records a
    * rows-only check; frame-count/dimension determinism and
    * decode(encode(frames)) == frames are MultimodalSpec's job. */
  val q160_video_features = QueryDef.unchecked("q160_video_features") { (s, d) =>
    decodeVideoFeatures(mediaWithCodecs(s, d, only = Some("video"))).toDF()
      .select(col("media_id"), col("n_frames"), col("width"), col("height"),
        round(aggregate(col("embedding"),
          lit(0.0d), (a, x) => a + x.cast("double")), 4).as("emb_sum"))
      .orderBy("media_id")
  }

  val all: Seq[QueryDef] = Seq(q36_media_meta, q39_media_features,
    q159_audio_features, q160_video_features)
}
