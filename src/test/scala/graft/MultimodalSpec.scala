package graft

import graft.operators.Multimodal

/** Multimodal plumbing: binary payloads + typed metadata survive the
  * Dataset boundary; the (stubbed) decode kernel runs partition-local
  * with correct shapes. */
class MultimodalSpec extends SparkSpec {

  test("media table: binary column round-trips, metadata consistent") {
    val media = Multimodal.mediaFromDocuments(spark, sf0001)
    val rows = media.limit(10).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.meta.n_bytes == r.bytes.length.toLong)
      assert(r.meta.kind == r.kind)
      assert(Set("image", "audio", "video")(r.kind))
    }
  }

  test("decodeFeatures: fixed-dim embeddings, deterministic") {
    val media = Multimodal.mediaFromDocuments(spark, sf0001)
    val f1 = Multimodal.decodeFeatures(media, dim = 16).collect()
      .map(f => f.media_id -> f.embedding.toSeq).toMap
    val f2 = Multimodal.decodeFeatures(media, dim = 16).collect()
      .map(f => f.media_id -> f.embedding.toSeq).toMap
    assert(f1 == f2, "stub decode must be deterministic")
    assert(f1.values.forall(_.length == 16))
  }

  test("batched kernel matches the per-row kernel exactly") {
    val media = Multimodal.mediaFromDocuments(spark, sf0001)
    def key(f: Multimodal.MediaFeature) =
      (f.media_id, f.kind, f.width, f.height, f.embedding.toSeq)
    val perRow = Multimodal.decodeFeatures(media, dim = 16).collect()
      .map(key).toSet
    // batchSize smaller than partitions' row counts → multiple kernel
    // calls per partition, exercising the chunk boundaries
    val batched = Multimodal.decodeFeaturesBatched(media, dim = 16,
      batchSize = 7).collect().map(key).toSet
    assert(batched == perRow)
  }

  test("REAL PNG decode: JDK codec round-trips the generated raster — " +
    "dims pinned to the fixture formula, features from actual pixels") {
    // encode → decode through javax.imageio and pin width/height against
    // the mediaWithImages formula (8 + id%9, 8 + id%7) for known ids
    for (id <- Seq(0L, 3L, 6L, 33L, 498L)) {
      val w = 8 + (id % 9).toInt
      val h = 8 + (id % 7).toInt
      val bytes = Multimodal.encodePng(id, w, h)
      assert(Multimodal.isPng(bytes), s"payload for id=$id lacks PNG magic")
      val (dw, dh, emb) = Multimodal.decodePng(bytes, 16)
      assert((dw, dh) == (w, h), s"id=$id decoded ${(dw, dh)}, want ${(w, h)}")
      // luma fold over the real raster, computed independently here
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val want = new Array[Float](16)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        want((y * w + x) % 16) += (0.2126f * ((rgb >> 16) & 0xff) +
          0.7152f * ((rgb >> 8) & 0xff) + 0.0722f * (rgb & 0xff)) / 255.0f
      }
      assert(emb.toSeq == want.toSeq, s"id=$id feature mismatch")
    }
  }

  test("mediaWithImages: image rows are real PNGs decoded by the kernel, " +
    "audio/video rows still ride the stub") {
    val media = Multimodal.mediaWithImages(spark, sf0001)
    val feats = Multimodal.decodeFeatures(media, dim = 16).collect()
      .map(f => f.media_id -> f).toMap
    val rows = media.collect().map(r => r.media_id -> r).toMap
    assert(rows.values.exists(r => r.kind == "image"))
    rows.values.foreach { r =>
      if (r.kind == "image") {
        assert(Multimodal.isPng(r.bytes), s"image row ${r.media_id} not a PNG")
        val f = feats(r.media_id)
        assert(f.width == 8 + (r.media_id % 9).toInt &&
          f.height == 8 + (r.media_id % 7).toInt,
          s"image ${r.media_id} decoded dims ${(f.width, f.height)} off-formula")
      } else {
        assert(!Multimodal.isPng(r.bytes))
        // metadata still consistent with the payload for stub kinds
        assert(r.meta.n_bytes == r.bytes.length.toLong)
      }
    }
    // a second run is bit-identical (PNG is lossless; raster is seeded)
    val again = Multimodal.decodeFeatures(media, dim = 16).collect()
      .map(f => f.media_id -> f.embedding.toSeq).toMap
    feats.foreach { case (id, f) => assert(again(id) == f.embedding.toSeq) }
  }

  test("REAL WAV decode: JDK codec round-trips the generated samples — " +
    "sample rate and duration pinned, features from actual PCM") {
    for (id <- Seq(1L, 4L, 7L, 100L, 499L)) {
      val rate = 8000 * (1 + (id % 3).toInt)
      val n = 32 + (id % 97).toInt
      val bytes = Multimodal.encodeWav(id, rate, n)
      assert(Multimodal.isWav(bytes), s"payload for id=$id lacks RIFF/WAVE")
      assert(!Multimodal.isPng(bytes))
      val (dRate, dN, emb) = Multimodal.decodeWav(bytes, 16)
      assert((dRate, dN) == (rate, n),
        s"id=$id decoded ${(dRate, dN)}, want ${(rate, n)}")
      // amplitude fold over the real samples, recomputed independently
      // from the LCG sample formula (the lossless-PCM contract:
      // decode(encode(s)) == s)
      val want = new Array[Float](16)
      for (i <- 0 until n) {
        val m = id * 6364136223846793005L + i * 3202034522624059733L +
          1442695040888963407L
        want(i % 16) += ((m >>> 24) & 0xffffL).toShort / 32768.0f
      }
      assert(emb.toSeq == want.toSeq, s"id=$id feature mismatch")
    }
  }

  test("mediaWithCodecs: audio rows are real WAVs, image rows real PNGs, " +
    "video rows real animated GIFs — every kind a JDK codec; q159 shape") {
    val media = Multimodal.mediaWithCodecs(spark, sf0001)
    val rows = media.collect()
    assert(rows.exists(_.kind == "audio") && rows.exists(_.kind == "video"))
    rows.foreach { r =>
      r.kind match {
        case "audio" =>
          assert(Multimodal.isWav(r.bytes), s"audio row ${r.media_id} not WAV")
          assert(r.meta.n_bytes == r.bytes.length.toLong)
        case "image" => assert(Multimodal.isPng(r.bytes))
        case _ =>
          assert(Multimodal.isGif(r.bytes), s"video row ${r.media_id} not GIF")
          assert(r.meta.n_bytes == r.bytes.length.toLong)
      }
    }
    // per-row and batched kernels agree across ALL THREE codec arms
    def key(f: Multimodal.MediaFeature) =
      (f.media_id, f.kind, f.width, f.height, f.embedding.toSeq)
    val perRow = Multimodal.decodeFeatures(media, dim = 16).collect()
    val batched = Multimodal.decodeFeaturesBatched(media, dim = 16,
      batchSize = 7).collect().map(key).toSet
    assert(perRow.map(key).toSet == batched)
    // audio features carry (sample rate, sample count) per the fixture
    // formula — the q159 sample-rate/duration pin
    perRow.filter(_.kind == "audio").foreach { f =>
      assert(f.width == 8000 * (1 + (f.media_id % 3).toInt) &&
        f.height == 32 + (f.media_id % 97).toInt,
        s"audio ${f.media_id} decoded ${(f.width, f.height)} off-formula")
    }
    // video features carry frame-0 dims per the fixture formula
    perRow.filter(_.kind == "video").foreach { f =>
      assert(f.width == 8 + (f.media_id % 9).toInt &&
        f.height == 8 + (f.media_id % 7).toInt,
        s"video ${f.media_id} decoded ${(f.width, f.height)} off-formula")
    }
    // the registry queries: one row per kind-matching document, rows > 0
    val q = SparkEntry.queries("q159_audio_features")(spark, sf0001).collect()
    assert(q.length == rows.count(_.kind == "audio") && q.nonEmpty)
    val qv = SparkEntry.queries("q160_video_features")(spark, sf0001).collect()
    assert(qv.length == rows.count(_.kind == "video") && qv.nonEmpty)
  }

  test("REAL GIF decode: JDK sequence reader round-trips every generated " +
    "frame pixel-exactly — frame count and dims pinned to the fixture " +
    "formula") {
    for (id <- Seq(2L, 5L, 8L, 101L, 497L)) {
      val w = 8 + (id % 9).toInt
      val h = 8 + (id % 7).toInt
      val nf = 2 + (id % 4).toInt
      val bytes = Multimodal.encodeGif(id, w, h, nf)
      assert(Multimodal.isGif(bytes), s"payload for id=$id lacks GIF magic")
      assert(!Multimodal.isPng(bytes) && !Multimodal.isWav(bytes))
      val frames = Multimodal.decodeGifFrames(bytes)
      assert(frames.length == nf, s"id=$id decoded ${frames.length} frames, want $nf")
      // pixel-exact round trip: the identity gray palette makes GIF
      // lossless, so every decoded gray equals the LCG formula
      for (f <- 0 until nf) {
        val img = frames(f)
        assert((img.getWidth, img.getHeight) == (w, h))
        for (y <- 0 until h; x <- 0 until w) {
          val m = id * 6364136223846793005L +
            f * -7046029254386353131L + x * 2862933555777941757L +
            y * 3202034522624059733L + 1442695040888963407L
          val g = ((m >>> 40) & 0xff).toInt
          val rgb = img.getRGB(x, y)
          assert(((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
            == (g, g, g),
            s"id=$id frame=$f pixel ($x,$y): got ${rgb.toHexString}, want gray $g")
        }
      }
      // the kernel's fold equals an independent recomputation over the
      // decoded frames (all frames, time-major bins)
      val (dw, dh, emb) = Multimodal.decodeGif(bytes, 16)
      assert((dw, dh) == (w, h))
      val want = new Array[Float](16)
      for (f <- 0 until nf; y <- 0 until h; x <- 0 until w) {
        val rgb = frames(f).getRGB(x, y)
        want(((f * h + y) * w + x) % 16) += (0.2126f * ((rgb >> 16) & 0xff) +
          0.7152f * ((rgb >> 8) & 0xff) + 0.0722f * (rgb & 0xff)) / 255.0f
      }
      assert(emb.toSeq == want.toSeq, s"id=$id feature mismatch")
    }
  }

  test("decodeVideoFeatures: frame count per the fixture formula; " +
    "non-GIF rows dropped") {
    val media = Multimodal.mediaWithCodecs(spark, sf0001)
    val vids = Multimodal.decodeVideoFeatures(media, dim = 16).collect()
    assert(vids.nonEmpty)
    val videoIds = media.collect().filter(_.kind == "video")
      .map(_.media_id).toSet
    assert(vids.map(_.media_id).toSet == videoIds)
    vids.foreach { v =>
      assert(v.n_frames == 2 + (v.media_id % 4).toInt,
        s"video ${v.media_id}: ${v.n_frames} frames off-formula")
      assert(v.width == 8 + (v.media_id % 9).toInt &&
        v.height == 8 + (v.media_id % 7).toInt)
      assert(v.embedding.length == 16)
    }
  }

  test("frameSample emits n frames per row") {
    val media = Multimodal.mediaFromDocuments(spark, sf0001).limit(5)
    val rows = Multimodal.frameSample(media, nFrames = 4)
      .select("frames").collect()
    assert(rows.forall(_.getSeq[String](0).length == 4))
  }

  test("media features compose with the similarity operators") {
    import org.apache.spark.sql.functions.col
    // the real multimodal use case: decoded embeddings feed the same
    // top-k/dedup machinery as the text embeddings table
    val media = Multimodal.mediaFromDocuments(spark, sf0001).limit(60)
    val emb = Multimodal.decodeFeatures(media).toDF()
      .select(col("media_id").as("vec_id"), col("embedding"))
    val topk = operators.Similarity.cosineTopK(emb, col("vec_id") < 3, 5)
    val rows = topk.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 15) // 3 queries x 5 neighbors
    assert(rows.forall { case (q, n, c) => q != n && c <= 1.0001 })
    val again = topk.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq == again.toSeq) // stub decode + top-k fully deterministic
  }

  test("resize bounds payloads, keeps metadata consistent, is deterministic") {
    val media = Multimodal.mediaFromDocuments(spark, sf0001).limit(50)
    val out = Multimodal.resize(media, targetBytes = 64).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.bytes.length <= 64)
      assert(r.meta.n_bytes == r.bytes.length.toLong)
      assert(r.meta.checksum == r.bytes.foldLeft(0L)((a, b) => a + (b & 0xff)))
    }
    // deterministic: a second pass produces byte-identical payloads
    val again = Multimodal.resize(media, targetBytes = 64).collect()
      .map(r => r.media_id -> r.bytes.toSeq).toMap
    out.foreach(r => assert(again(r.media_id) == r.bytes.toSeq))
    // small payloads pass through untouched
    val tiny = Multimodal.resize(media, targetBytes = 1 << 20).collect()
      .map(r => r.media_id -> r.bytes.toSeq).toMap
    val orig = media.collect().map(r => r.media_id -> r.bytes.toSeq).toMap
    assert(tiny == orig)
  }
}
