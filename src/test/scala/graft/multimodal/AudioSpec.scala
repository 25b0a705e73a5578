package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AudioSpec extends SparkSpec {

  private def wav(fmt: AudioFormat, pcm: Array[Byte], frames: Long): Array[Byte] = {
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, frames)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("square-wave WAV features are closed-form exact") {
    val id = 42L
    val hp = 1 + (id % 7).toInt
    val n = hp * (200 + (id % 11).toInt)
    val a = (1000L + (id * 37L) % 20000L).toInt
    val f = Multimodal.JavaSoundCodec.audioFeatures(Multimodal.renderWav(id))
    assert(f.sample_rate == 8000 && f.channels == 1)
    assert(f.duration_ms == n.toLong * 1000L / 8000L)
    assert(f.rms == a / 32768.0, "RMS must be IEEE-exact on a square wave")
    assert(f.peak == a / 32768.0)
    assert(f.zcr == (n / hp - 1).toDouble / (n - 1).toDouble)
  }

  test("sine-wave RMS lands near amplitude/sqrt(2)") {
    val sr = 8000; val n = 8000; val amp = 16000
    val pcm = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      val v = math.round(amp * math.sin(2 * math.Pi * 440 * i / sr)).toInt
      pcm(2 * i) = (v & 0xFF).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
    }
    val f = Multimodal.JavaSoundCodec.audioFeatures(
      wav(new AudioFormat(sr.toFloat, 16, 1, true, false), pcm, n.toLong))
    val expect = amp / 32768.0 / math.sqrt(2)
    assert(math.abs(f.rms - expect) < 0.001, s"rms=${f.rms} expect~$expect")
    // 440 Hz: two crossings per cycle
    assert(math.abs(f.zcr - 2.0 * 440 / sr) < 0.001)
  }

  test("8-bit unsigned WAV rides the JDK conversion chain") {
    // constant +0.25-ish: u8 value 192 = (192-128)/128 = +0.5
    val n = 1000
    val pcm = Array.fill(n)(192.toByte)
    val f = Multimodal.JavaSoundCodec.audioFeatures(
      wav(new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED,
        8000f, 8, 1, 1, 8000f, false), pcm, n.toLong))
    assert(f.channels == 1 && f.duration_ms == 125L)
    assert(math.abs(f.peak - 0.5) < 0.01, s"peak=${f.peak}")
    assert(f.zcr == 0.0)
  }

  test("stereo WAV reports 2 channels and extracts channel 0") {
    val n = 500
    val pcm = new Array[Byte](n * 4)
    (0 until n).foreach { i =>
      val l = 8000; val r = -12000 // constant left, constant right
      pcm(4 * i) = (l & 0xFF).toByte; pcm(4 * i + 1) = ((l >> 8) & 0xFF).toByte
      pcm(4 * i + 2) = (r & 0xFF).toByte; pcm(4 * i + 3) = ((r >> 8) & 0xFF).toByte
    }
    val f = Multimodal.JavaSoundCodec.audioFeatures(
      wav(new AudioFormat(8000f, 16, 2, true, false), pcm, n.toLong))
    assert(f.channels == 2)
    assert(f.peak == 8000 / 32768.0, "must profile channel 0, not channel 1")
  }

  test("resample halves the frame count and preserves a constant signal") {
    val src = Multimodal.renderWav(3L) // hp=4 → slow square wave
    val down = Multimodal.JavaSoundCodec.resample(src, 4000)
    val f0 = Multimodal.JavaSoundCodec.audioFeatures(src)
    val f1 = Multimodal.JavaSoundCodec.audioFeatures(down)
    assert(f1.sample_rate == 4000)
    assert(math.abs(f1.duration_ms - f0.duration_ms) <= 1)
    // linear interp across the step edges erodes peaks only slightly
    assert(math.abs(f1.peak - f0.peak) < 0.05)
  }

  test("audio features are stable across repartitioning") {
    val audio = Multimodal.syntheticAudio(spark, sf)
    def run(parts: Int) =
      Multimodal.withAudioFeatures(audio.repartition(parts), "blob", Multimodal.JavaSoundCodec)
        .select(col("doc_id"), col("audio_features.rms"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(run(1) == run(5))
  }
}
