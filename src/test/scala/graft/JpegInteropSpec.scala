package graft

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.Jpeg

/** INTEROP proof: the streams [[Jpeg]] writes are real JPEGs a
  * third-party decoder accepts, and real third-party JPEGs decode
  * through [[Jpeg]] — cross-checked against the JDK's own codec
  * (javax.imageio, a libjpeg-lineage implementation that shares NONE
  * of our tables or fixed-point choices).
  *
  * Tolerances are principled, not hopeful: two conforming decoders may
  * differ per pixel because the spec fixes the IDCT only to an
  * accuracy envelope (ISO 10918-1 Annex A / IEEE 1180) — our Q20
  * separable IDCT and ImageIO's differ by a few LSBs on sharp blocks,
  * and color paths additionally differ in YCbCr rounding and chroma
  * upsampling filters. Grayscale structural fields (dimensions,
  * channel count) must match exactly; pixels within a small envelope.
  */
class JpegInteropSpec extends AnyFunSuite with Matchers {

  private def randCoefs(rnd: Random): Array[Int] = {
    val bytes = new Array[Byte](64); rnd.nextBytes(bytes)
    Jpeg.coefFromBytes(bytes, 0)
  }

  test("ImageIO reads our gray streams: dims exact, pixels within the " +
      "IDCT accuracy envelope") {
    for (seed <- 0 until 10) {
      // ONE generator per seed shared across the 4 fills: a fresh
      // Random per element made every block identical, so all DC
      // diffs were zero and the cross-block prediction chain went
      // unexercised
      val r = new Random(seed)
      val blocks = IndexedSeq.fill(4)(randCoefs(r))
      blocks.map(_(0)).distinct.length should be > 1 // chains are live
      val enc = Jpeg.encode(16, 16, Seq((1, 0)), blocks)
      val img = ImageIO.read(new ByteArrayInputStream(enc))
      img should not be null
      (img.getWidth, img.getHeight) shouldBe ((16, 16))
      val ours = Jpeg.decode(enc)
      var maxDiff = 0
      for (y <- 0 until 16; x <- 0 until 16) {
        val theirs = img.getRaster.getSample(x, y, 0)
        val mine = ours.pixels(y * 16 + x) & 0xff
        maxDiff = math.max(maxDiff, math.abs(theirs - mine))
      }
      withClue(s"seed $seed max |pixel diff| vs ImageIO:") {
        maxDiff should be <= 2 // two conforming IDCTs, no color path
      }
    }
  }

  test("ImageIO reads our restart-interval and 4:2:0 streams") {
    val r43 = new Random(43)
    val blocks = IndexedSeq.fill(8)(randCoefs(r43))
    val rst = Jpeg.encode(32, 16, Seq((1, 0)), blocks, restartInterval = 2)
    val i1 = ImageIO.read(new ByteArrayInputStream(rst))
    i1 should not be null
    (i1.getWidth, i1.getHeight) shouldBe ((32, 16))
    // chroma blocks DC-ONLY: on flat chroma fields every conforming
    // upsampling filter (our pinned replicate, ImageIO's triangular)
    // returns the same value, so the remaining disagreement is just
    // IDCT + conversion rounding. Noise chroma would legitimately
    // diverge by ~half the sample-to-sample swing at block edges —
    // that's the filter, not a bug, and not what this test pins.
    val rnd47 = new Random(47)
    val yBlocks = IndexedSeq.fill(4)(randCoefs(rnd47))
    val dcOnly = IndexedSeq.fill(2) {
      val zz = new Array[Int](64); zz(0) = rnd47.nextInt(40) - 20; zz
    }
    val c420 = Jpeg.encode(16, 16, Seq((1, 0), (2, 1), (3, 1)),
      yBlocks ++ dcOnly,
      sampling = Seq((2, 2), (1, 1), (1, 1)))
    val i2 = ImageIO.read(new ByteArrayInputStream(c420))
    i2 should not be null
    (i2.getWidth, i2.getHeight) shouldBe ((16, 16))
    val ours = Jpeg.decode(c420)
    var maxDiff = 0
    for (y <- 0 until 16; x <- 0 until 16; c <- 0 until 3) {
      val rgb = i2.getRGB(x, y)
      val theirs = c match {
        case 0 => (rgb >> 16) & 0xff
        case 1 => (rgb >> 8) & 0xff
        case 2 => rgb & 0xff
      }
      val mine = ours.pixels((y * 16 + x) * 3 + c) & 0xff
      maxDiff = math.max(maxDiff, math.abs(theirs - mine))
    }
    maxDiff should be <= 8 // IDCT envelope + conversion rounding only
  }

  test("our decoder reads ImageIO-written gray JPEGs (third-party " +
      "DQT/DHT/APP0 handling) and agrees with ImageIO's own decode") {
    val rnd = new Random(53)
    val img = new BufferedImage(24, 16, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 16; x <- 0 until 24)
      img.getRaster.setSample(x, y, 0,
        (128 + 90 * math.sin(x * 0.7) + 30 * rnd.nextGaussian()).toInt
          .max(0).min(255))
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos) shouldBe true
    val bytes = bos.toByteArray
    // a real third-party stream: JFIF APP0, standard Annex-K huffman
    // tables, ImageIO's quantizers — none of our declared tables
    val ours = Jpeg.decode(bytes)
    (ours.width, ours.height, ours.channels) shouldBe ((24, 16, 1))
    val theirs = ImageIO.read(new ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (y <- 0 until 16; x <- 0 until 24) {
      val t = theirs.getRaster.getSample(x, y, 0)
      val m = ours.pixels(y * 24 + x) & 0xff
      maxDiff = math.max(maxDiff, math.abs(t - m))
    }
    maxDiff should be <= 2 // same stream, two conforming IDCTs
  }

  test("our decoder reads ImageIO-written COLOR JPEGs (4:2:0 with the " +
      "writer's own sampling/tables)") {
    val img = new BufferedImage(32, 16, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 16; x <- 0 until 32) {
      val r = (x * 8) & 0xff; val g = (y * 16) & 0xff
      val b = ((x + y) * 5) & 0xff
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos) shouldBe true
    val bytes = bos.toByteArray
    val ours = Jpeg.decode(bytes)
    (ours.width, ours.height, ours.channels) shouldBe ((32, 16, 3))
    val theirs = ImageIO.read(new ByteArrayInputStream(bytes))
    var sumDiff = 0L; var maxDiff = 0
    for (y <- 0 until 16; x <- 0 until 32; c <- 0 until 3) {
      val rgb = theirs.getRGB(x, y)
      val t = c match {
        case 0 => (rgb >> 16) & 0xff
        case 1 => (rgb >> 8) & 0xff
        case 2 => rgb & 0xff
      }
      val m = ours.pixels((y * 32 + x) * 3 + c) & 0xff
      sumDiff += math.abs(t - m); maxDiff = math.max(maxDiff, math.abs(t - m))
    }
    // different upsampling filters (ours: pinned replicate; theirs:
    // triangular) legitimately diverge along the gradient's chroma
    // slope — a constant ~half-sample offset, measured mean 3.3 on
    // this image; bound the mean by that envelope and the max loosely
    (sumDiff.toDouble / (16 * 32 * 3)) should be < 5.0
    maxDiff should be <= 32
  }
}
