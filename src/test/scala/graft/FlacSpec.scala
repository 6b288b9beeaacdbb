package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Flac

class FlacSpec extends AnyFunSuite {

  test("closed-form fixture parses to the oracle's exact fields") {
    for (d <- 0L to 60L) {
      val m = Flac.meta(Flac.synth(d))
      val sr = (d % 3) match {
        case 0 => 44100; case 1 => 48000; case _ => 96000
      }
      val total = 10000L + 37 * d % 50000
      assert(m.sampleRate == sr, s"d=$d")
      assert(m.channels == (1 + d % 2).toInt, s"d=$d")
      assert(m.bitsPerSample == (if (d % 2 == 0) 16 else 24), s"d=$d")
      assert(m.totalSamples == total, s"d=$d")
      assert(m.durationMs == total * 1000L / sr, s"d=$d")
      assert(m.nBlocks == (if (d % 2 == 0) 3 else 2), s"d=$d")
      assert(m.title == s"t${d % 20}", s"d=$d")
    }
  }

  test("bit-packing edges: 8 channels, 32 bps, 36-bit total samples") {
    // hand-build a STREAMINFO-only stream at the field ceilings
    val si = new Array[Byte](34)
    val sr = 655350 // 20-bit max valid rate
    si(10) = (sr >> 12).toByte
    si(11) = ((sr >> 4) & 0xff).toByte
    val ch = 8; val bps = 32
    si(12) = (((sr & 0xf) << 4) | ((ch - 1) << 1) | ((bps - 1) >> 4)).toByte
    val total = (1L << 36) - 1
    si(13) = ((((bps - 1) & 0xf) << 4) | ((total >> 32) & 0xf)).toInt.toByte
    si(14) = ((total >> 24) & 0xff).toByte
    si(15) = ((total >> 16) & 0xff).toByte
    si(16) = ((total >> 8) & 0xff).toByte
    si(17) = (total & 0xff).toByte
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    out.write(si, 0, 34)
    val m = Flac.meta(out.toByteArray)
    assert(m.sampleRate == sr && m.channels == 8 &&
      m.bitsPerSample == 32 && m.totalSamples == total && m.title == null)
  }

  test("malformed streams fail loudly") {
    val good = Flac.synth(4L)
    // STREAMINFO not first: flip the first block's type to PADDING
    val b1 = good.clone(); b1(4) = 0x01
    intercept[IllegalArgumentException] { Flac.meta(b1) }
    // block length overrunning the file
    val b2 = good.clone(); b2(7) = 0x7f.toByte
    intercept[IllegalArgumentException] { Flac.meta(b2) }
    // truncated before the last block ends
    intercept[IllegalArgumentException] {
      Flac.meta(java.util.Arrays.copyOfRange(good, 0, good.length - 3))
    }
    // wrong magic
    val b3 = good.clone(); b3(0) = 'g'
    intercept[IllegalArgumentException] { Flac.meta(b3) }
    // vorbis length overrun: corrupt the vendor length (LE u32) to huge
    val b4 = good.clone()
    // find the VORBIS_COMMENT block: walk blocks
    var off = 4
    var done = false
    while (!done) {
      val typ = b4(off) & 0x7f
      val len = ((b4(off + 1) & 0xff) << 16) | ((b4(off + 2) & 0xff) << 8) |
        (b4(off + 3) & 0xff)
      if (typ == 4) { b4(off + 4 + 3) = 0x7f.toByte; done = true }
      else off += 4 + len
    }
    intercept[IllegalArgumentException] { Flac.meta(b4) }
  }

  test("parser terminates loudly under random corruption") {
    val rng = new scala.util.Random(99)
    for (trial <- 0 until 300) {
      val b = Flac.synth((trial % 7).toLong).clone()
      (0 to rng.nextInt(6)).foreach { _ =>
        b(rng.nextInt(b.length)) = rng.nextInt(256).toByte
      }
      try { Flac.meta(b); () }
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
