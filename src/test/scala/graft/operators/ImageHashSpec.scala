package graft.operators

import graft.SparkSuite
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaRow

/** Perceptual average-hash over real decoded pixels: known bit patterns,
  * non-divisible dims, and the near-dup pair contract. */
class ImageHashSpec extends SparkSuite {
  import spark.implicits._

  private def png(w: Int, h: Int, luma: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = luma(x, y) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def media(rows: (Long, Array[Byte])*) =
    rows.map { case (id, p) => MediaRow(id, "image", None, None, None, Some(1), p) }
      .toDF()

  test("half-bright image hashes to the expected bit pattern") {
    // left half luma 200, right half 50 → mean 125 → bits set iff j < 4
    val m = media((1L, png(16, 16, (x, _) => if (x < 8) 200 else 50)))
    val sig = Multimodal.imageAHashes(m).collect().head.ahash
    assert(sig == 0x0F0F0F0F0F0F0F0FL,
      s"got ${java.lang.Long.toHexString(sig)}")
  }

  test("constant image hashes to zero (no cell exceeds the mean)") {
    val m = media((1L, png(9, 7, (_, _) => 77))) // dims not divisible by 8
    assert(Multimodal.imageAHashes(m).collect().head.ahash == 0L)
  }

  test("near-dup pairs: identical → 0, one flipped cell → small, opposite → absent") {
    // bump brightens one DARK 2×2 cell (cell (0,4)) so exactly that hash
    // bit flips; brightening an already-bright cell would flip nothing
    def quarters(bump: Boolean): (Int, Int) => Int = (x, y) =>
      if (bump && x >= 8 && x < 10 && y < 2) 250
      else if ((x / 8 + y / 8) % 2 == 0) 200 else 50
    val m = media(
      (1L, png(16, 16, quarters(bump = false))),
      (2L, png(16, 16, quarters(bump = false))), // identical to 1
      (3L, png(16, 16, quarters(bump = true))), // one 2×2 corner brightened
      (4L, png(16, 16, (x, y) => if ((x / 8 + y / 8) % 2 == 0) 50 else 200)))
    val got = Multimodal.imageNearDupPairs(m, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.get((1L, 2L)).contains(0L))
    assert(got.contains((1L, 3L)) && got((1L, 3L)) <= 3L && got((1L, 3L)) > 0L)
    assert(!got.contains((1L, 4L))) // inverted checkerboard: hamming 64
  }
}
