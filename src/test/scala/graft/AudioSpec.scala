package graft

import org.apache.spark.sql.functions._

import graft.ops.{ModelInference, Multimodal}

/** The audio face of the media pipeline: the synthetic WAV corpus is a
  * genuine RIFF/WAVE container whose decode round-trips the closed-form
  * sample formula bit-for-bit; the waveform embedder honors the batch
  * contract and the projection arithmetic the q215 oracle replays.
  */
class AudioSpec extends SparkSuite {

  private def closedFormSamples(id: Long): Array[Long] = {
    val n = (48 + id % 17).toInt
    Array.tabulate(n)(t =>
      ((id * 13 + t.toLong * t * 7 + t * 29L) % 65536) - 32768)
  }

  test("syntheticWav encodes a real container the PCM decode round-trips") {
    Seq(0L, 1L, 7L, 16L, 17L, 101L, 65535L, 1234567L).foreach { id =>
      val wav = Multimodal.syntheticWav(id)
      // the metadata walk sees the declared format
      assert(Multimodal.decodeWav(wav).contains((8000, 1,
        (48 + id % 17) * 2 * 1000L / 16000L)))
      // the sample walk reproduces the closed form exactly
      val got = Multimodal.decodeWavSamples(wav)
      assert(got.isDefined, s"id=$id failed to decode")
      assert(got.get.toSeq == closedFormSamples(id).toSeq, s"id=$id samples")
    }
  }

  test("decodeWavSamples rejects non-PCM16 and corrupt payloads") {
    assert(Multimodal.decodeWavSamples("not a wav at all".getBytes).isEmpty)
    val wav = Multimodal.syntheticWav(3L)
    val corrupt = wav.clone(); corrupt(0) = 'X'.toByte
    assert(Multimodal.decodeWavSamples(corrupt).isEmpty)
  }

  test("waveform embedder matches the projection formula and batch contract") {
    val dim = 16
    val embedder = new ModelInference.WaveProjectionEmbedder(dim)
    def expected(s: Array[Long]): Array[Long] =
      Array.tabulate(dim) { k0 =>
        s.zipWithIndex.map { case (v, t) =>
          v * (((t + 1).toLong * (k0 + 6)) % 19 - 9)
        }.sum
      }
    val waves = Array(7L, 42L, 1000L).map(closedFormSamples)
    assert(embedder.embedBatch(waves).map(_.toSeq).toSeq ==
      waves.map(expected).map(_.toSeq).toSeq)

    // batch contract through the seam: rows preserved, order preserved,
    // one model call per batchSize rows
    val sp = spark
    import sp.implicits._
    val calls = spark.sparkContext.longAccumulator("audio_calls")
    val counting = new ModelInference.AudioEmbedder {
      val dim = 4
      def embedBatch(ws: Array[Array[Long]]): Array[Array[Long]] = {
        calls.add(1)
        ws.map(_ => Array(0L, 0L, 0L, 0L))
      }
    }
    val df = (1L to 130L).map(i => (i, Seq(i, -i))).toDF("media_id", "samples")
      .repartition(1)
    val out = ModelInference.embedAudio(df, "samples", counting, 64)
    assert(out.count() == 130)
    assert(calls.value == 3) // 64 + 64 + 2
  }

  test("audio encode stage assigns the oracle's sign bucket") {
    val sp = spark
    import sp.implicits._
    val media = Multimodal.syntheticAudioMedia(spark,
      Seq(0L, 5L, 17L, 103L).toDF("doc_id"))
    val enc = Multimodal.decodeWaves(spark, media).toDF()
      .select(col("media_id"), col("samples"))
    val embedded = ModelInference.embedAudio(enc, "samples",
      new ModelInference.WaveProjectionEmbedder(16), 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    embedded.foreach { case (id, e) =>
      val want = new ModelInference.WaveProjectionEmbedder(16)
        .embedBatch(Array(closedFormSamples(id))).head
      assert(e.toSeq == want.toSeq, s"id=$id")
    }
  }
}
