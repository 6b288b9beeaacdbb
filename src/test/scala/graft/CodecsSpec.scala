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
  }
}
