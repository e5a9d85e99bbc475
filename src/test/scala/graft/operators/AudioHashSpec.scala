package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Energy-envelope audio hash over the REAL javax.sound decode path:
  * container invariance, edit locality, separation, and the banded
  * near-dup join's exactness. */
class AudioHashSpec extends SparkSpec {

  /** Deterministic PCM16 clip: a seeded loudness envelope (64 beats of
    * alternating quiet/loud sine), strongly structured so segment
    * energies sit away from the mean. */
  private def samples(seed: Int, n: Int = 6400): Array[Short] = {
    val rnd = new scala.util.Random(seed)
    val beats = Array.fill(64)(if (rnd.nextBoolean()) 0.9 else 0.1)
    Array.tabulate(n) { i =>
      val amp = beats(i * 64 / n)
      (math.sin(i * 0.3) * amp * 30000).toShort
    }
  }

  private def wav(ss: Array[Short], bigEndian: Boolean = false,
      tpe: AudioFileFormat.Type = AudioFileFormat.Type.WAVE): Array[Byte] = {
    val bytes = new Array[Byte](ss.length * 2)
    var i = 0
    while (i < ss.length) {
      val v = ss(i)
      if (bigEndian) { bytes(2 * i) = (v >> 8).toByte; bytes(2 * i + 1) = v.toByte }
      else { bytes(2 * i) = v.toByte; bytes(2 * i + 1) = (v >> 8).toByte }
      i += 1
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, bigEndian)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, ss.length), tpe, out)
    out.toByteArray
  }

  private def hd(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("same samples hash identically across containers and endianness") {
    val ss = samples(1)
    val w = Multimodal.audioHash(wav(ss)).get
    val aiff = Multimodal.audioHash(
      wav(ss, bigEndian = true, tpe = AudioFileFormat.Type.AIFF)).get
    assert(w == aiff, "container/endianness must not affect the hash")
  }

  test("small noise moves few bits; different material moves many") {
    val base = samples(2)
    val h0 = Multimodal.audioHash(wav(base)).get
    val rnd = new scala.util.Random(99)
    val noisy = base.map(v =>
      (v + rnd.nextInt(401) - 200).max(Short.MinValue.toInt)
        .min(Short.MaxValue.toInt).toShort)
    assert(hd(h0, Multimodal.audioHash(wav(noisy)).get) <= 6,
      "low-level noise must not move the envelope hash")
    val other = samples(77)
    assert(hd(h0, Multimodal.audioHash(wav(other)).get) > 12,
      "independent material must separate")
  }

  test("banded audio near-dup pairs == brute-force Hamming") {
    val rows = Seq(
      Row(1L, wav(samples(3)), "wav"),
      Row(2L, wav(samples(3), bigEndian = true,
        tpe = AudioFileFormat.Type.AIFF), "aiff"), // cross-container dup
      Row(3L, wav(samples(4)), "wav"),
      Row(4L, Array[Byte](9, 9, 9), "wav"), // corrupt: drops
      Row(5L, wav(samples(3)), "png")) // mislabeled format: drops
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.MediaSchema)
    val hashes = Multimodal.audioHashes(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes.keySet == Set(1L, 2L, 3L))
    val want = (for {
      a <- hashes.keys; b <- hashes.keys; if a < b
      d = hd(hashes(a), hashes(b)); if d <= 6
    } yield (a, b, d)).toSet
    val got = Multimodal.nearDupAudioPairs(media, maxHd = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).intValue))
      .toSet
    assert(got == want)
    assert(got.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0),
      "cross-container duplicate at hd 0")
  }
}
