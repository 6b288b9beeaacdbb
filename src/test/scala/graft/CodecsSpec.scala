package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Codecs
import graft.operators.Codecs.{Bmp, Wav}

/** The real codec bodies must round-trip bit-exactly — including the
  * layout corners the fixture queries don't hit (odd widths with
  * 4-byte row padding, extreme sample values, sign extension).
  * scalacheck Gens sampled directly, per OperatorPropsSpec (the
  * scalatestplus bridge is not in the offline cache). */
class CodecsSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val pixelGen = Gen.zip(
    Gen.choose(0, 255), Gen.choose(0, 255), Gen.choose(0, 255))

  test("BMP encode/decode round-trips arbitrary pixels, incl. padded strides") {
    val imgGen = for {
      w <- Gen.choose(1, 9) // widths 1..9 exercise stride padding 0..3
      h <- Gen.choose(1, 7)
      px <- Gen.listOfN(h, Gen.listOfN(w, pixelGen))
    } yield Bmp(w, h, px.map(_.toArray).toArray)
    val imgs = samples(imgGen, 60)
    assert(imgs.size >= 50)
    imgs.foreach { img =>
      val back = Codecs.decodeBmp(Codecs.encodeBmp(img))
      assert(back.width == img.width && back.height == img.height)
      assert(back.pixels.flatten.toSeq == img.pixels.flatten.toSeq,
        s"pixel mismatch at ${img.width}x${img.height}")
    }
  }

  test("WAV encode/decode round-trips the full i16 range") {
    val wavGen = for {
      n <- Gen.choose(1, 300)
      s <- Gen.listOfN(n, Gen.choose(-32768, 32767))
    } yield Wav(8000, s.toArray)
    val wavs = samples(wavGen, 60) :+
      Wav(8000, Array(-32768, 32767, 0, -1, 1))
    wavs.foreach { w =>
      val back = Codecs.decodeWav(Codecs.encodeWavPcm16(w))
      assert(back.sampleRate == w.sampleRate)
      assert(back.samples.toSeq == w.samples.toSeq)
    }
  }

  test("resizeNearest samples floor(dst*src/dstDim) positions") {
    val img = Codecs.synthBmp(7L, 16, 12)
    val small = Codecs.resizeNearest(img, 8, 6)
    (0 until 6).foreach { y =>
      (0 until 8).foreach { x =>
        assert(small.pixels(y)(x) == img.pixels(2 * y)(2 * x))
      }
    }
    // non-integral ratio too
    val odd = Codecs.resizeNearest(img, 5, 5)
    (0 until 5).foreach { y =>
      (0 until 5).foreach { x =>
        assert(odd.pixels(y)(x) == img.pixels(y * 12 / 5)(x * 16 / 5))
      }
    }
  }

  test("decode rejects non-media payloads loudly") {
    intercept[IllegalArgumentException](Codecs.decodeBmp("nope".getBytes))
    intercept[IllegalArgumentException](Codecs.decodeWav("nope".getBytes))
    intercept[IllegalArgumentException](Codecs.decodePng("nope".getBytes))
  }

  test("decode rejects malformed-but-tagged payloads loudly") {
    // top-down BMP (negative biHeight) — reject, don't NegativeArraySize
    val bmp = Codecs.encodeBmp(Codecs.synthBmp(1L, 4, 3))
    val topDown = bmp.clone()
    topDown(25) = 0xff.toByte // height 3 -> negative i32le
    topDown(24) = 0xfd.toByte
    intercept[IllegalArgumentException](Codecs.decodeBmp(topDown))
    // truncated BMP pixel data
    intercept[IllegalArgumentException](
      Codecs.decodeBmp(java.util.Arrays.copyOf(bmp, bmp.length - 8)))
    // WAV with a non-'data' chunk at offset 36 (e.g. a LIST chunk)
    val wav = Codecs.encodeWavPcm16(Codecs.synthWav(1L, 16))
    val listChunk = wav.clone()
    listChunk(36) = 'L'; listChunk(37) = 'I'; listChunk(38) = 'S'; listChunk(39) = 'T'
    intercept[IllegalArgumentException](Codecs.decodeWav(listChunk))
    // WAV whose declared data size exceeds the payload
    val shortWav = java.util.Arrays.copyOf(wav, wav.length - 6)
    intercept[IllegalArgumentException](Codecs.decodeWav(shortWav))
  }

  private def pngChunkBytes(typ: String, data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val len = new Array[Byte](4)
    len(0) = ((data.length >> 24) & 0xff).toByte
    len(1) = ((data.length >> 16) & 0xff).toByte
    len(2) = ((data.length >> 8) & 0xff).toByte
    len(3) = (data.length & 0xff).toByte
    out.write(len)
    val tb = typ.getBytes("US-ASCII")
    out.write(tb); out.write(data)
    val crc = new java.util.zip.CRC32(); crc.update(tb); crc.update(data)
    val cv = crc.getValue.toInt
    out.write(Array[Byte](((cv >> 24) & 0xff).toByte, ((cv >> 16) & 0xff).toByte,
      ((cv >> 8) & 0xff).toByte, (cv & 0xff).toByte))
    out.toByteArray
  }

  test("decode rejects hostile headers loudly (no OOM, no hang)") {
    // BMP declaring width 2^30: Int rowStride would overflow negative
    // and sail past the truncation check into a giant allocation
    val bmp = Codecs.encodeBmp(Codecs.synthBmp(1L, 4, 3))
    val wide = bmp.clone()
    wide(18) = 0; wide(19) = 0; wide(20) = 0; wide(21) = 0x40.toByte
    val e1 = intercept[IllegalArgumentException](Codecs.decodeBmp(wide))
    assert(e1.getMessage.contains("truncated"), e1.getMessage)
    // PNG IHDR declaring 2^28 x 2^28 (valid CRC): must bound BEFORE
    // allocating, not NegativeArraySize/OOM
    val ihdr = new Array[Byte](13)
    ihdr(0) = 0x10; ihdr(4) = 0x10 // w = h = 0x10000000
    ihdr(8) = 8; ihdr(9) = 2
    val sig = Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)
    val hugePng = sig ++ pngChunkBytes("IHDR", ihdr) ++
      pngChunkBytes("IDAT", Array[Byte](0x78, 0x01)) ++
      pngChunkBytes("IEND", Array.emptyByteArray)
    val e2 = intercept[IllegalArgumentException](Codecs.decodePng(hugePng))
    assert(e2.getMessage.contains("too large"), e2.getMessage)
    // PNG whose zlib stream sets FDICT (preset dictionary): inflate()
    // makes no progress but needsInput() stays false — must error, not
    // spin the decode loop forever. 0x78 0x20: (0x7820 % 31 == 0, bit
    // 0x20 = FDICT set) is a header-valid zlib stream.
    val good = Codecs.encodePng(Codecs.synthBmp(2L, 4, 4))
    val ihdrEnd = 8 + 25
    val iendStart = good.length - 12
    val fdictPng = good.take(ihdrEnd) ++
      pngChunkBytes("IDAT", Array[Byte](0x78, 0x20, 1, 2, 3, 4)) ++
      good.drop(iendStart)
    val e3 = intercept[IllegalArgumentException](Codecs.decodePng(fdictPng))
    assert(e3.getMessage.contains("IDAT"), e3.getMessage)
  }

  test("PNG encode/decode round-trips arbitrary pixels with cycling filters") {
    val imgGen = for {
      w <- Gen.choose(1, 9)
      h <- Gen.choose(1, 7)
      px <- Gen.listOfN(h, Gen.listOfN(w, pixelGen))
    } yield Bmp(w, h, px.map(_.toArray).toArray)
    val imgs = samples(imgGen, 60)
    assert(imgs.size >= 50)
    imgs.foreach { img =>
      val back = Codecs.decodePng(Codecs.encodePng(img))
      assert(back.width == img.width && back.height == img.height)
      assert(back.pixels.flatten.toSeq == img.pixels.flatten.toSeq,
        s"pixel mismatch at ${img.width}x${img.height}")
    }
  }

  test("PNG round-trips under each single filter type 0-4") {
    // One image per filter type, every row filtered the same way, so a
    // broken unfilter path cannot hide behind its working neighbors.
    val img = Codecs.synthBmp(42L, 16, 12)
    (0 to 4).foreach { f =>
      val back = Codecs.decodePng(Codecs.encodePng(img, _ => f))
      assert(back.pixels.flatten.toSeq == img.pixels.flatten.toSeq,
        s"filter type $f does not round-trip")
    }
  }

  test("PNG decode validates chunk CRC") {
    val png = Codecs.encodePng(Codecs.synthBmp(3L, 8, 8))
    val corrupt = png.clone()
    // flip a byte inside the IDAT payload (after sig + IHDR chunk)
    corrupt(8 + 25 + 20) = (corrupt(8 + 25 + 20) ^ 0x5a).toByte
    intercept[IllegalArgumentException](Codecs.decodePng(corrupt))
  }

  test("PNG decode skips ancillary chunks") {
    // splice a tEXt chunk between IHDR and IDAT; decode must ignore it
    val png = Codecs.encodePng(Codecs.synthBmp(5L, 6, 4))
    val ihdrEnd = 8 + 25
    val payload = "graft".getBytes("US-ASCII")
    val chunk = new java.io.ByteArrayOutputStream()
    val len = Array[Byte](0, 0, 0, payload.length.toByte)
    chunk.write(len)
    val tb = "tEXt".getBytes("US-ASCII")
    chunk.write(tb); chunk.write(payload)
    val crc = new java.util.zip.CRC32(); crc.update(tb); crc.update(payload)
    val cv = crc.getValue.toInt
    chunk.write(Array[Byte](((cv >> 24) & 0xff).toByte, ((cv >> 16) & 0xff).toByte,
      ((cv >> 8) & 0xff).toByte, (cv & 0xff).toByte))
    val spliced = png.take(ihdrEnd) ++ chunk.toByteArray ++ png.drop(ihdrEnd)
    val back = Codecs.decodePng(spliced)
    assert(back.pixels.flatten.toSeq ==
      Codecs.synthBmp(5L, 6, 4).pixels.flatten.toSeq)
  }
}
