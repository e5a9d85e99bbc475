package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

/** Perceptual aHash over the REAL ImageIO decode path: container
  * invariance, locality (small edit → few bits), separation (inverted
  * image → many bits), and the banded near-dup join's pigeonhole
  * exactness against brute-force Hamming. */
class ImageHashSpec extends SparkSpec {

  /** Deterministic 64×64 test raster: strong 4-quadrant contrast plus
    * seeded noise, so every aHash cell sits well away from the global
    * mean (stable under small perturbations). */
  private def raster(seed: Int): BufferedImage = {
    val img = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
    val rnd = new scala.util.Random(seed)
    for (y <- 0 until 64; x <- 0 until 64) {
      val base = (if (x < 32) 40 else 200) + (if (y < 32) 0 else 30)
      val v = math.min(255, math.max(0, base + rnd.nextInt(11) - 5))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  private def hd(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("same raster hashes identically across containers (PNG vs BMP)") {
    val img = raster(1)
    val png = Multimodal.averageHash(encode(img, "png")).get
    val bmp = Multimodal.averageHash(encode(img, "bmp")).get
    assert(png == bmp, "container must not affect the perceptual hash")
  }

  test("a small edit moves few bits; inversion moves many") {
    val base = raster(2)
    val hBase = Multimodal.averageHash(encode(base, "png")).get
    // brighten ONE 8x8 cell region moderately
    val edited = raster(2)
    for (y <- 8 until 16; x <- 8 until 16) {
      val v = math.min(255, (edited.getRGB(x, y) & 0xff) + 60)
      edited.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val hEdit = Multimodal.averageHash(encode(edited, "png")).get
    assert(hd(hBase, hEdit) <= 6, s"small edit drifted ${hd(hBase, hEdit)} bits")
    // full inversion flips (nearly) every cell-vs-mean relation
    val inv = raster(2)
    for (y <- 0 until 64; x <- 0 until 64) {
      val v = 255 - (inv.getRGB(x, y) & 0xff)
      inv.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val hInv = Multimodal.averageHash(encode(inv, "png")).get
    assert(hd(hBase, hInv) > 20, s"inversion only moved ${hd(hBase, hInv)} bits")
  }

  test("banded near-dup pairs == brute-force Hamming; non-images drop") {
    val rows = Seq(
      Row(1L, encode(raster(3), "png"), "png"),
      Row(2L, encode(raster(3), "bmp"), "bmp"), // exact perceptual dup of 1
      Row(3L, encode(raster(4), "png"), "png"),
      Row(4L, encode(raster(5), "png"), "png"),
      Row(5L, Array[Byte](1, 2, 3), "png"), // corrupt: must drop
      Row(6L, encode(raster(3), "png"), "txt")) // non-image format: drop
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.MediaSchema)
    val hashes = Multimodal.imageHashes(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes.keySet == Set(1L, 2L, 3L, 4L),
      s"corrupt + non-image rows must drop: ${hashes.keySet}")
    val maxHd = 6
    val want = (for {
      a <- hashes.keys; b <- hashes.keys; if a < b
      d = hd(hashes(a), hashes(b)); if d <= maxHd
    } yield (a, b, d)).toSet
    val got = Multimodal.nearDupImagePairs(media, maxHd).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue.toInt))
      .toSet
    assert(got == want, s"banding must be pigeonhole-exact: got $got want $want")
    assert(got.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0),
      "the cross-container duplicate must surface at hd 0")
  }
}
