package graft

import scala.util.Random

import graft.operators.Jpeg

class JpegSpec extends SparkSpec {

  /** Reference pixels straight from the coefficient arrays: dezigzag,
    * dequantize, the pinned fixed-point IDCT, block placement —
    * everything BELOW the entropy layer, so an exact match proves the
    * Huffman/marker roundtrip is lossless. */
  private def refGray(w: Int, h: Int,
                      blocks: IndexedSeq[Array[Int]]): Array[Int] = {
    val bw8 = (w + 7) / 8
    val out = new Array[Int](w * h)
    blocks.zipWithIndex.foreach { case (zz, m) =>
      val by = m / bw8; val bx = m % bw8
      val dq = new Array[Long](64)
      for (i <- 0 until 64) {
        val n = Jpeg.ZigZag(i)
        dq(n) = zz(i).toLong * Jpeg.QtLuma(n)
      }
      val px = Jpeg.idct(dq)
      for (y <- 0 until 8; x <- 0 until 8
           if by * 8 + y < h && bx * 8 + x < w)
        out((by * 8 + y) * w + bx * 8 + x) = px(y * 8 + x)
    }
    out
  }

  private def randCoefs(rnd: Random): Array[Int] = {
    val bytes = new Array[Byte](64); rnd.nextBytes(bytes)
    Jpeg.coefFromBytes(bytes, 0)
  }

  test("zigzag order matches the spec table (spot values + permutation)") {
    Jpeg.ZigZag.take(16).toSeq shouldBe
      Seq(0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5)
    Jpeg.ZigZag(63) shouldBe 63
    Jpeg.ZigZag.sorted.toSeq shouldBe (0 until 64)
    for (n <- 0 until 64) Jpeg.ZigZag(Jpeg.ZigZagInv(n)) shouldBe n
  }

  test("pinned IDCT table: DC entry and per-row unit norm in Q20") {
    // k(0)/sqrt(2)/2 * 2^20 = 370727.6 -> 370728
    Jpeg.IdctW(0) shouldBe 370728L
    for (u <- 0 until 8) {
      val norm = (0 until 8).map(x => math.pow(Jpeg.IdctW(u * 8 + x).toDouble, 2)).sum
      math.abs(norm / math.pow(2, 40) - 1.0) should be < 1e-5
    }
  }

  test("fixed-point IDCT tracks the double-precision IDCT within 1 LSB") {
    val rnd = new Random(7)
    for (_ <- 0 until 20) {
      val zz = randCoefs(rnd)
      val dq = new Array[Long](64)
      for (i <- 0 until 64) {
        val n = Jpeg.ZigZag(i); dq(n) = zz(i).toLong * Jpeg.QtLuma(n)
      }
      val fixed = Jpeg.idct(dq)
      val dbl = Array.tabulate(64) { j =>
        val y = j / 8; val x = j % 8
        var s = 0.0
        for (u <- 0 until 8; v <- 0 until 8) {
          val ku = if (u == 0) 1.0 / math.sqrt(2) else 1.0
          val kv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
          s += ku * kv / 4.0 * dq(u * 8 + v) *
            math.cos((2 * y + 1) * u * math.Pi / 16) *
            math.cos((2 * x + 1) * v * math.Pi / 16)
        }
        math.max(0, math.min(255, math.round(s + 128).toInt))
      }
      for (j <- 0 until 64)
        math.abs(fixed(j) - dbl(j)) should be <= 1
    }
  }

  test("gray roundtrip: entropy coding is lossless over 50 fuzz seeds") {
    var sawStuffing = false
    for (seed <- 0 until 50) {
      val rnd = new Random(seed)
      val (w, h) = (Seq(8, 16, 24)(rnd.nextInt(3)), Seq(8, 16)(rnd.nextInt(2)))
      val nb = (w / 8) * (h / 8)
      val blocks = IndexedSeq.fill(nb)(randCoefs(rnd))
      val enc = Jpeg.encode(w, h, Seq((1, 0)), blocks)
      // detect byte stuffing inside the entropy segment
      if (enc.sliding(2).exists(p => (p(0) & 0xff) == 0xff && p(1) == 0x00))
        sawStuffing = true
      val img = Jpeg.decode(enc)
      (img.width, img.height, img.channels) shouldBe ((w, h, 1))
      img.pixels.map(_ & 0xff).toSeq shouldBe refGray(w, h, blocks).toSeq
    }
    withClue("fuzz never exercised 0xFF00 byte stuffing:") {
      sawStuffing shouldBe true
    }
  }

  test("ZRL: a >16-zero AC run survives the roundtrip") {
    val zz = new Array[Int](64)
    zz(0) = 5; zz(1) = 9; zz(40) = -3; zz(63) = 1 // runs of 38 and 22
    val enc = Jpeg.encode(8, 8, Seq((1, 0)), IndexedSeq(zz))
    Jpeg.decode(enc).pixels.map(_ & 0xff).toSeq shouldBe
      refGray(8, 8, IndexedSeq(zz)).toSeq
  }

  test("DC prediction chains across blocks (and per component)") {
    val blocks = IndexedSeq.tabulate(4) { b =>
      val zz = new Array[Int](64); zz(0) = Seq(-30, 31, -32, 0)(b); zz
    }
    val enc = Jpeg.encode(16, 16, Seq((1, 0)), blocks)
    Jpeg.decode(enc).pixels.map(_ & 0xff).toSeq shouldBe
      refGray(16, 16, blocks).toSeq
  }

  test("color roundtrip: 4:4:4 YCbCr with the pinned integer conversion") {
    val rnd = new Random(11)
    val nMcu = 2 // 16x8
    val blocks = IndexedSeq.fill(nMcu * 3)(randCoefs(rnd))
    val enc = Jpeg.encode(16, 8, Seq((1, 0), (2, 1), (3, 1)), blocks)
    val img = Jpeg.decode(enc)
    (img.width, img.height, img.channels) shouldBe ((16, 8, 3))
    // reference: per-component planes through the same pinned IDCT,
    // then the Q16 conversion replayed here independently
    def plane(c: Int): Array[Int] = {
      val out = new Array[Int](16 * 8)
      for (m <- 0 until nMcu) {
        val zz = blocks(m * 3 + c)
        val qt = if (c == 0) Jpeg.QtLuma else Jpeg.QtChroma
        val dq = new Array[Long](64)
        for (i <- 0 until 64) {
          val n = Jpeg.ZigZag(i); dq(n) = zz(i).toLong * qt(n)
        }
        val px = Jpeg.idct(dq)
        for (y <- 0 until 8; x <- 0 until 8)
          out(y * 16 + m * 8 + x) = px(y * 8 + x)
      }
      out
    }
    val (py, pcb, pcr) = (plane(0), plane(1), plane(2))
    def rdiv(x: Long, d: Long): Long = (x + d / 2) / d
    def cl(v: Long): Int = if (v < 0) 0 else if (v > 255) 255 else v.toInt
    for (i <- 0 until 16 * 8) {
      val y = py(i).toLong; val cb = pcb(i).toLong - 128
      val cr = pcr(i).toLong - 128
      (img.pixels(i * 3) & 0xff) shouldBe cl(y + rdiv(91881L * cr, 65536))
      (img.pixels(i * 3 + 1) & 0xff) shouldBe
        cl(y - rdiv(22554L * cb + 46802L * cr, 65536))
      (img.pixels(i * 3 + 2) & 0xff) shouldBe cl(y + rdiv(116130L * cb, 65536))
    }
  }

  test("4:2:0 roundtrip: 2x2 luma MCUs, replicate chroma upsample, " +
      "per-MCU and cross-MCU DC chains") {
    val rnd = new Random(23)
    // 32x16: two 16x16 MCUs -> luma DC chains across 8 Y blocks,
    // chroma across 2 blocks each
    val (w, h) = (32, 16)
    val nMcu = 2
    val blocks = IndexedSeq.fill(nMcu * 6)(randCoefs(rnd))
    val enc = Jpeg.encode(w, h, Seq((1, 0), (2, 1), (3, 1)), blocks,
      sampling = Seq((2, 2), (1, 1), (1, 1)))
    val img = Jpeg.decode(enc)
    (img.width, img.height, img.channels) shouldBe ((w, h, 3))
    // reference: per-component planes through the pinned IDCT, then
    // replicate upsample + Q16 conversion replayed independently
    def blockPx(zz: Array[Int], qt: Array[Int]): Array[Int] = {
      val dq = new Array[Long](64)
      for (i <- 0 until 64) { val n = Jpeg.ZigZag(i); dq(n) = zz(i).toLong * qt(n) }
      Jpeg.idct(dq)
    }
    // Y plane 32x16: MCU m, quadrant q at rows (q/2)*8, cols m*16+(q%2)*8
    val yp = new Array[Int](w * h)
    for (m <- 0 until nMcu; qd <- 0 until 4) {
      val px = blockPx(blocks(m * 6 + qd), Jpeg.QtLuma)
      for (r <- 0 until 8; c <- 0 until 8)
        yp(((qd / 2) * 8 + r) * w + m * 16 + (qd % 2) * 8 + c) = px(r * 8 + c)
    }
    // chroma planes 16x8 (one 8x8 block per MCU)
    val cbp = new Array[Int](16 * 8); val crp = new Array[Int](16 * 8)
    for (m <- 0 until nMcu) {
      val cb = blockPx(blocks(m * 6 + 4), Jpeg.QtChroma)
      val cr = blockPx(blocks(m * 6 + 5), Jpeg.QtChroma)
      for (r <- 0 until 8; c <- 0 until 8) {
        cbp(r * 16 + m * 8 + c) = cb(r * 8 + c)
        crp(r * 16 + m * 8 + c) = cr(r * 8 + c)
      }
    }
    def rdiv(x: Long, d: Long): Long = (x + d / 2) / d
    def cl(v: Long): Int = if (v < 0) 0 else if (v > 255) 255 else v.toInt
    for (y <- 0 until h; x <- 0 until w) {
      val yy = yp(y * w + x).toLong
      val cb = cbp((y / 2) * 16 + x / 2).toLong - 128
      val cr = crp((y / 2) * 16 + x / 2).toLong - 128
      withClue(s"pixel ($y,$x):") {
        (img.pixels((y * w + x) * 3) & 0xff) shouldBe
          cl(yy + rdiv(91881L * cr, 65536))
        (img.pixels((y * w + x) * 3 + 1) & 0xff) shouldBe
          cl(yy - rdiv(22554L * cb + 46802L * cr, 65536))
        (img.pixels((y * w + x) * 3 + 2) & 0xff) shouldBe
          cl(yy + rdiv(116130L * cb, 65536))
      }
    }
  }

  test("restart intervals: markers cycle, DC predictors reset, pixels " +
      "identical to the marker-free stream") {
    val rnd = new Random(31)
    for (interval <- Seq(1, 2, 3, 5)) {
      val (w, h) = (32, 16) // 8 MCUs
      val blocks = IndexedSeq.fill(8)(randCoefs(rnd))
      val plain = Jpeg.encode(w, h, Seq((1, 0)), blocks)
      val rst = Jpeg.encode(w, h, Seq((1, 0)), blocks,
        restartInterval = interval)
      // restart machinery is container-only: decoded rasters identical
      Jpeg.decode(rst).pixels.toSeq shouldBe Jpeg.decode(plain).pixels.toSeq
      // the stream genuinely carries RSTn markers (not stuffed FF00)
      val nMarkers = rst.sliding(2).count(p =>
        (p(0) & 0xff) == 0xff && (p(1) & 0xf8) == 0xd0 &&
          (p(1) & 0xff) != 0xd8 /* not SOI */)
      nMarkers shouldBe (8 - 1) / interval
    }
    // corrupted restart sequence fails loudly: swap RST0 -> RST2
    val blocks = IndexedSeq.fill(8)(randCoefs(new Random(37)))
    val rst = Jpeg.encode(32, 16, Seq((1, 0)), blocks, restartInterval = 4)
    val at = rst.indices.find(i =>
      (rst(i) & 0xff) == 0xff && (rst(i + 1) & 0xff) == 0xd0).get
    val bad = rst.clone(); bad(at + 1) = 0xd2.toByte
    intercept[IllegalArgumentException](Jpeg.decode(bad))
      .getMessage should include("restart marker")
  }

  test("APPn and COM segments are skipped (JFIF-shaped streams decode)") {
    val zz = new Array[Int](64); zz(0) = 10; zz(5) = -7
    val enc = Jpeg.encode(8, 8, Seq((1, 0)), IndexedSeq(zz))
    // splice an APP0 JFIF header + a COM right after SOI
    val app0 = Array[Int](0xff, 0xe0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0,
      1, 1, 0, 0, 1, 0, 1, 0, 0).map(_.toByte)
    val com = Array[Int](0xff, 0xfe, 0x00, 0x07, 'g', 'r', 'a', 'f', 't')
      .map(_.toByte)
    val spliced = enc.take(2) ++ app0 ++ com ++ enc.drop(2)
    Jpeg.decode(spliced).pixels.toSeq shouldBe Jpeg.decode(enc).pixels.toSeq
  }

  test("corrupted streams fail loudly") {
    val zz = new Array[Int](64); zz(0) = 3; zz(2) = 4
    val enc = Jpeg.encode(16, 8, Seq((1, 0)), IndexedSeq(zz, zz))

    // missing SOI
    intercept[IllegalArgumentException](Jpeg.decode(enc.drop(2)))
      .getMessage should include("SOI")
    // truncated mid-markers
    intercept[IllegalArgumentException](Jpeg.decode(enc.take(8)))
    // truncated entropy data (strip EOI + last entropy bytes)
    intercept[IllegalArgumentException](Jpeg.decode(enc.dropRight(4)))
    // progressive SOF rejected: rewrite SOF0 marker byte to SOF2
    val prog = enc.clone()
    val sofAt = prog.indices.find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xC0).get
    prog(sofAt + 1) = 0xC2.toByte
    intercept[IllegalArgumentException](Jpeg.decode(prog))
      .getMessage should include("progressive")
    // DRI declares interval 1 but the stream carries no RST markers:
    // the decoder must demand one after the first MCU, loudly
    val dri = Array[Int](0xff, 0xdd, 0x00, 0x04, 0x00, 0x01).map(_.toByte)
    val withDri = enc.take(2) ++ dri ++ enc.drop(2)
    intercept[IllegalArgumentException](Jpeg.decode(withDri))
      .getMessage should include("restart marker")
    // segment length overrunning the payload
    val bad = enc.clone()
    bad(4) = 0x7f // DQT length MSB -> overrun
    intercept[IllegalArgumentException](Jpeg.decode(bad))
      .getMessage should include("overruns")
  }

  test("Huffman tables: canonical encode/decode views agree") {
    for (t <- Seq(Jpeg.DcTable, Jpeg.AcTable)) {
      val codes = t.encode
      codes.size shouldBe t.huffval.length
      // canonical codes are prefix-free and unique at their lengths
      val all = codes.values.toSeq
      all.distinct.size shouldBe all.size
      // decoder tables invert the encoder assignment
      for ((sym, (code, len)) <- codes) {
        t.maxCode(len) should be >= code
        t.huffval(t.valPtr(len) + code - t.minCode(len)) shouldBe sym
      }
    }
  }
}
