package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.tables.Catalog

class TextAnalysisSpec extends SparkSuite {
  import SparkSpec.spark.implicits._

  test("token counts: whitespace vs BPE-ish") {
    val df = Seq("hello world", "a b  c", "x, y! 42z").toDF("text")
      .select(TextAnalysis.tokenCount(col("text")).as("ws"),
        TextAnalysis.bpeishTokenCount(col("text")).as("bpe"))
      .as[(Int, Int)].collect().toSeq
    assert(df == Seq((2, 2), (3, 3), (3, 6))) // "x , y ! 42 z"
  }

  test("occurrences counts non-overlapping, left-to-right") {
    val r = Seq(" the cat the dog the ", " the the ").toDF("t")
      .select(TextAnalysis.occurrences(col("t"), " the ").as("n"))
      .as[Double].collect().toSeq
    // separated hits each have their own spaces (3); adjacent 'the the'
    // shares the middle space, so the second occurrence is not counted
    assert(r == Seq(3.0, 1.0))
  }

  test("hash60 is stable and positive") {
    val h = Seq("abc").toDF("s")
      .select(TextAnalysis.hash60(col("s"))).first().getLong(0)
    assert(h == 648541476951500027L) // 0x900150983cd24fb
  }

  test("predictedLang ties break in declaration order, 'und' when no hits") {
    val r = Seq("the der", "zzz qqq").toDF("text")
      .select(TextAnalysis.predictedLang(col("text")).as("l"))
      .as[String].collect().toSeq
    assert(r == Seq("en", "und"))
  }
}

class DedupSpec extends SparkSuite {
  import SparkSpec.spark.implicits._

  private lazy val docs = Seq(
    (1L, "a b c d e"), (2L, "a b c d e x"), (3L, "q w e r t y u"),
    (4L, "a b c d e")).toDF("doc_id", "text")

  test("shingles: n-grams with short-doc guard") {
    val sh = Dedup.shingles(Seq((1L, "a b c d"), (2L, "a b")).toDF("doc_id", "text"), 3)
      .as[(Long, String)].collect().toSeq
    assert(sh == Seq((1L, "a b c"), (1L, "b c d"))) // doc 2: too short
  }

  test("exact groups collapse identical content") {
    val g = Dedup.exactGroups(docs).collect()
    assert(g.length == 3)
    val dup = g.find(_.getAs[Long]("n_copies") == 2).get
    assert(dup.getAs[Long]("keep_id") == 1L)
  }

  test("minhash: identical docs share full signature, near docs share bands") {
    val sigs = Dedup.minhashSignature(Dedup.hashedShingles(docs, 3))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(sigs(1L) == sigs(4L)) // identical text → identical signature
    val cands = Dedup.minhashCandidates(docs, 3)
      .as[(Long, Long)].collect().toSet
    assert(cands.contains((1L, 4L)))
    assert(cands.contains((1L, 2L)) || cands.contains((2L, 4L))) // near dup
    assert(!cands.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated doc
  }

  test("simhash: identical docs equal; fingerprint fits 32 bits") {
    val fp = Dedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(4L))
    assert(fp.values.forall(v => v >= 0 && v < (1L << 32)))
  }

  test("jaccard pairs: exact dup = 1.0, disjoint absent") {
    val p = Dedup.jaccardPairs(docs, 3, 0.2).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("jaccard")).toMap
    assert(p((1L, 4L)) == 1.0)
    assert(!p.keySet.exists(k => k._1 == 3L || k._2 == 3L))
  }

  test("connected components: chains, separate clusters, singletons") {
    import SparkSpec.spark.implicits._
    // component {1,2,3,4} as a CHAIN (diameter 3 — needs >1 round),
    // component {10,11}, singleton 20
    val verts = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L).toDF("doc_id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(verts, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
    // reversed edge direction must not matter (symmetrized internally)
    val cc2 = Dedup.connectedComponents(verts,
      Seq((4L, 3L), (3L, 2L), (2L, 1L), (11L, 10L)).toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc2 == cc)
    // localEdgeThreshold = 0 forces the DISTRIBUTED pointer-doubling
    // path; both phases must resolve the same components
    val cc3 = Dedup.connectedComponents(verts, edges, localEdgeThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc3 == cc)
  }

  test("prefix-filtered jaccard equals the plain inverted-index join") {
    // several thresholds: the prefix + length filters must be lossless
    Seq(0.3, 0.5, 0.8).foreach { t =>
      val plain = Dedup.jaccardPairs(docs, 3, t).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("inter"),
          r.getAs[Double]("jaccard"))).toSet
      val pref = Dedup.jaccardPrefixPairs(docs, 3, t).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("inter"),
          r.getAs[Double]("jaccard"))).toSet
      assert(pref == plain, s"threshold $t")
    }
  }

  test("hot-shingle DF cap stops boilerplate fan-out (skew guard)") {
    // 20 otherwise-disjoint docs sharing one boilerplate sentence: the
    // uncapped inverted index fans the boilerplate shingles into all
    // C(20,2)=190 pairs; with maxDf < 20 the boilerplate is dropped and
    // no pair survives.
    val boiler = "all rights reserved by the graft corpus"
    val bdocs = (1L to 20L).map(i =>
      (i, s"$boiler unique$i distinct$i tokens$i only$i here$i"))
      .toDF("doc_id", "text")
    val uncapped = Dedup.jaccardPairs(bdocs, 3, 0.1).count()
    assert(uncapped == 190L, "boilerplate must fan out uncapped")
    assert(Dedup.jaccardPairs(bdocs, 3, 0.1, maxDf = 10).count() == 0L)
    // same guard on the minhash path: capped signatures come only from
    // each doc's unique tail, so no two docs share a band bucket
    assert(Dedup.minhashCandidates(bdocs, 3, maxDf = 10).count() == 0L)
    // and the cap is a no-op when nothing is hot
    assert(Dedup.jaccardPairs(docs, 3, 0.2, maxDf = 10).count() ==
      Dedup.jaccardPairs(docs, 3, 0.2).count())
  }
}

class AsOfJoinSpec extends SparkSuite {
  import SparkSpec.spark.implicits._

  test("as-of join: inclusive bound, carry-forward, no-match null") {
    val left = Seq((1L, 10L, 100L), (1L, 11L, 200L), (1L, 12L, 250L),
      (2L, 20L, 50L)).toDF("k", "id", "ts")
    val right = Seq((1L, 100L, 7L), (1L, 210L, 9L)).toDF("k", "rts", "v")
    val out = graft.ops.AsOfJoin(left, right, "k", "ts", "rts",
      Seq("v"), Seq("id"))
      .select("k", "id", "v").as[(Long, Long, Option[Long])]
      .collect().toSet
    assert(out == Set(
      (1L, 10L, Some(7L)), // rts == ts: inclusive bound
      (1L, 11L, Some(7L)), // carried forward (no newer right yet)
      (1L, 12L, Some(9L)), // newer right row at 210 <= 250 wins
      (2L, 20L, None)))    // no right rows for key 2
  }

  test("as-of picks ONE right row: a NULL value column is not blended") {
    // latest right row (ts 200) has v2 = NULL; true ASOF semantics carry
    // that NULL, never an older row's v2 — per-column carry-forward
    // would wrongly blend v1 from ts 200 with v2 from ts 100.
    val left = Seq((1L, 1L, 300L)).toDF("k", "id", "ts")
    val right = Seq((1L, 100L, Some(10L), Some(20L)),
      (1L, 200L, Some(11L), None))
      .toDF("k", "rts", "v1", "v2")
    val out = graft.ops.AsOfJoin(left, right, "k", "ts", "rts",
      Seq("v1", "v2"), Seq("id"))
      .select("v1", "v2").as[(Option[Long], Option[Long])].collect().toSeq
    assert(out == Seq((Some(11L), None)))
  }
}

class SimilaritySpec extends SparkSuite {
  import SparkSpec.spark.implicits._

  test("integer-scaled cosine: parallel = 1, orthogonal = 0") {
    val df = Seq(
      (Seq(1f, 0f), Seq(2f, 0f)), // parallel
      (Seq(1f, 0f), Seq(0f, 3f)), // orthogonal
      (Seq(1f, 1f), Seq(-1f, -1f))) // opposite
      .toDF("a", "b")
      .select(Similarity.cosineFrom(
        Similarity.intVec(col("a")), Similarity.intVec(col("b")),
        Similarity.norm2(Similarity.intVec(col("a"))).cast("double"),
        Similarity.norm2(Similarity.intVec(col("b"))).cast("double")).as("c"))
      .as[Double].collect().toSeq
    assert(df == Seq(1.0, 0.0, -1.0))
  }
}

class MultimodalSpec extends SparkSuite {
  test("media plumbing: binary payload, stub decode, batch shape") {
    val media = Multimodal.mediaFromDocuments(Catalog.documents(spark, sf))
    assert(media.schema("content").dataType.typeName == "binary")
    val feats = Multimodal.decodeFeatures(spark, media)
    val f = feats.filter(col("media_id") === 0).head()
    assert(f.digest.length == 32)
    assert(f.width == f.n_bytes % 640 && f.height == f.n_bytes % 480)
    assert(feats.count() == media.count())
  }

  test("resize stage: bounds payload, preserves small rows, composes with decode") {
    val media = Multimodal.mediaFromDocuments(Catalog.documents(spark, sf))
    val resized = Multimodal.resize(spark, media, maxBytes = 100)
    val rows = resized.collect()
    assert(rows.forall(r => r.n_bytes == r.content.length))
    assert(rows.forall(_.n_bytes <= 201)) // stride sampling ≤ ~2× target
    // small payloads pass through untouched
    val small = media.filter(org.apache.spark.sql.functions.col("n_bytes") <= 100)
      .count()
    assert(rows.count(_.n_bytes <= 100) >= small)
    // stages compose: decode runs on the resized payloads
    val feats = Multimodal.decodeFeatures(spark, resized.toDF())
    assert(feats.count() == media.count())
  }

  test("image kind decodes REAL payloads: true width/height via ImageIO") {
    import SparkSpec.spark.implicits._
    // genuine in-memory PNG and BMP payloads with known dimensions
    def img(w: Int, h: Int, fmt: String): Array[Byte] = {
      val bi = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y =>
        bi.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(bi, fmt, bos)
      bos.toByteArray
    }
    val png = img(37, 23, "png"); val bmp = img(5, 9, "bmp")
    val media = Seq(
      Multimodal.MediaRow(1L, "image", png, png.length.toLong),
      Multimodal.MediaRow(2L, "image", bmp, bmp.length.toLong),
      // audio kind with an image payload still goes through the stub
      Multimodal.MediaRow(3L, "audio", png, png.length.toLong)).toDS()
    val f = Multimodal.decodeFeatures(spark, media.toDF())
      .collect().map(r => r.media_id -> r).toMap
    assert(f(1L).width == 37 && f(1L).height == 23)
    assert(f(1L).frame_sample == "37x23")
    assert(f(2L).width == 5 && f(2L).height == 9)
    assert(f(3L).width == png.length % 640) // stub path for non-image
  }

  test("audio kind decodes REAL WAV payloads: rate/channels/duration") {
    import SparkSpec.spark.implicits._
    // genuine in-memory PCM WAV via the JDK's own writer
    def wav(rate: Int, channels: Int, seconds: Double): Array[Byte] = {
      val frames = (rate * seconds).toInt
      val data = Array.tabulate(frames * channels * 2)(i => (i * 7).toByte)
      val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16,
        channels, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val mono = wav(8000, 1, 0.5); val stereo = wav(44100, 2, 0.25)
    val media = Seq(
      Multimodal.MediaRow(1L, "audio", mono, mono.length.toLong),
      Multimodal.MediaRow(2L, "audio", stereo, stereo.length.toLong),
      // image kind with a WAV payload still goes through the stub
      Multimodal.MediaRow(3L, "image", mono, mono.length.toLong)).toDS()
    val f = Multimodal.decodeFeatures(spark, media.toDF())
      .collect().map(r => r.media_id -> r).toMap
    assert(f(1L).width == 8000 && f(1L).height == 1)
    assert(f(1L).frame_sample == "8000hz 1ch 500ms")
    assert(f(2L).width == 44100 && f(2L).height == 2)
    assert(f(2L).frame_sample.endsWith("ms") &&
      f(2L).frame_sample.startsWith("44100hz 2ch"))
    assert(f(3L).width == mono.length % 640) // stub path for non-audio
  }

  test("sub-byte PCM WAV (bits<8) rejects to the stub, not a wrong duration") {
    // hand-built header: the JDK writer can't emit 4-bit PCM
    def wav4bit(bits: Int): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      def ascii(s: String) = bos.write(s.getBytes("US-ASCII"))
      def le32(v: Int) = (0 to 3).foreach(i => bos.write((v >> (8 * i)) & 0xff))
      def le16(v: Int) = (0 to 1).foreach(i => bos.write((v >> (8 * i)) & 0xff))
      ascii("RIFF"); le32(36 + 64); ascii("WAVE")
      ascii("fmt "); le32(16); le16(1 /*PCM*/); le16(1 /*ch*/)
      le32(8000); le32(8000 * bits / 8); le16(bits / 8); le16(bits)
      ascii("data"); le32(64); bos.write(new Array[Byte](64))
      bos.toByteArray
    }
    assert(Multimodal.decodeWav(wav4bit(4)).isEmpty)
    assert(Multimodal.decodeWav(wav4bit(8)) == Some((8000, 1, 8L)))
  }

  test("video kind parses REAL MP4 containers: dims/duration") {
    import SparkSpec.spark.implicits._
    // hand-built ISO-BMFF: ftyp + moov(mvhd v0 + audio trak(0x0) +
    // video trak(tkhd 320x240)) — box sizes computed bottom-up
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def boxOf(name: String, payload: Array[Byte]): Array[Byte] =
      be32(8L + payload.length) ++ name.getBytes("US-ASCII") ++ payload
    def tkhd(w: Int, h: Int): Array[Byte] = {
      // v0: ver/flags + ctime/mtime/trackid/reserved/duration + 8
      // reserved + layer/altgroup/volume/reserved + 36 matrix, then
      // width/height as 16.16 fixed point
      val pre = new Array[Byte](76)
      boxOf("tkhd", pre ++ be32(w.toLong << 16) ++ be32(h.toLong << 16))
    }
    def mvhd(timescale: Long, duration: Long): Array[Byte] = {
      val pre = new Array[Byte](12) // ver/flags + ctime + mtime
      boxOf("mvhd", pre ++ be32(timescale) ++ be32(duration) ++
        new Array[Byte](80))
    }
    val moov = boxOf("moov",
      mvhd(600, 4500) ++ // 7.5 s at timescale 600
        boxOf("trak", tkhd(0, 0)) ++ // audio track: no dims
        boxOf("trak", tkhd(320, 240)))
    val mp4 = boxOf("ftyp", "isom0000".getBytes("US-ASCII")) ++ moov
    assert(Multimodal.decodeMp4(mp4) == Some((320, 240, 7500L)))
    // truncated/garbage payloads reject to the stub, never crash
    assert(Multimodal.decodeMp4(mp4.take(20)).isEmpty)
    assert(Multimodal.decodeMp4("not an mp4 at all".getBytes).isEmpty)

    val media = Seq(
      Multimodal.MediaRow(1L, "video", mp4, mp4.length.toLong),
      Multimodal.MediaRow(2L, "video", "plain text".getBytes,
        10L)).toDS()
    val f = Multimodal.decodeFeatures(spark, media.toDF())
      .collect().map(r => r.media_id -> r).toMap
    assert(f(1L).width == 320 && f(1L).height == 240)
    assert(f(1L).frame_sample == "320x240 7500ms")
    assert(f(2L).width == 10 % 640) // stub path for non-MP4 payload
  }

  test("repartitionForMedia bounds partition payload") {
    val media = Multimodal.mediaFromDocuments(Catalog.documents(spark, sf))
    val re = Multimodal.repartitionForMedia(media, totalBytes = 1L << 30,
      targetBytes = 128L << 20)
    assert(re.rdd.getNumPartitions == 8)
  }

  test("real pixel resize: true dims, closed-form pixels survive the trip") {
    // decode → nearest-neighbor resample → RGB tensor must reproduce
    // the synthetic pixel function at mapped coordinates exactly
    val id = 5L
    val png = Multimodal.syntheticPng(id)
    val Some((bytes, w, h)) = Multimodal.resizeImagePixels(png, 8)
    val (sw, sh) = ((8 + id % 13).toInt, (8 + id % 7).toInt)
    val m = math.max(sw, sh)
    val (ew, eh) =
      if (m <= 8) (sw, sh)
      else (math.max(1, sw * 8 / m), math.max(1, sh * 8 / m))
    assert((w, h) == (ew, eh))
    assert(bytes.length == w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (sx, sy) = (x * sw / w, y * sh / h)
      val o = (y * w + x) * 3
      assert((bytes(o) & 0xff) == ((id * 31 + sx * 7 + sy * 3) % 256).toInt)
      assert((bytes(o + 1) & 0xff) == ((sx * 5 + sy * 11 + 1) % 256).toInt)
      assert((bytes(o + 2) & 0xff) == ((id + sx + sy * 13) % 256).toInt)
    }
    // an image already inside the budget passes through at native dims
    val tiny = {
      val bi = new java.awt.image.BufferedImage(
        4, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(bi, "png", bos)
      bos.toByteArray
    }
    assert(Multimodal.resizeImagePixels(tiny, 8).map(r => (r._2, r._3))
      .contains((4, 3)))
    // non-image payloads are rejected, not mangled
    assert(Multimodal.resizeImagePixels("not a png".getBytes, 8).isEmpty)
  }

  test("resizeImages stage: batched, row-per-decodable-image, checksum pinned") {
    val media = Multimodal.syntheticImageMedia(
      spark, Catalog.documents(spark, sf))
    val out = Multimodal.resizeImages(spark, media, 8).collect()
    assert(out.length == media.count())
    // spot-check one row against the single-payload path
    val r5 = out.find(_.media_id == 5L).get
    val Some((bytes, w, h)) =
      Multimodal.resizeImagePixels(Multimodal.syntheticPng(5L), 8)
    assert(r5.width == w && r5.height == h && r5.n_bytes == bytes.length)
    assert(r5.checksum == Multimodal.byteChecksum(bytes))
  }
}
