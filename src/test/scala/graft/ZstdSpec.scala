package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Zstd

class ZstdSpec extends AnyFunSuite {

  test("XXH64 matches Spark's catalyst implementation") {
    // the independent cross-check the checksum ladder rests on: our
    // from-spec XXH64 against the one Spark's xxhash64 expression uses
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.Platform
    val rng = new scala.util.Random(8878)
    for (trial <- 0 until 200) {
      val n = rng.nextInt(200)
      val b = Array.fill(n)(rng.nextInt(256).toByte)
      val seed = if (trial % 3 == 0) 0L else rng.nextLong()
      val ours = Zstd.xxh64(b, 0, n, seed)
      val spark = XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET,
        n, seed)
      assert(ours == spark, s"trial $trial n=$n seed=$seed")
    }
  }

  test("closed-form streams walk to the oracle fields") {
    for (d <- 0L until 100L) {
      val m = Zstd.walk(Zstd.synth(d))
      val nf = (1 + d % 3).toInt
      assert(m.nFrames == nf, s"d=$d")
      assert(m.nSkippable ==
        (if (d % 4 == 0 && d % 3 >= 1) 1 else 0), s"d=$d skip")
      assert(m.checksummed == (if (d % 2 == 0) nf else 0))
      assert(m.dictId == (if (d % 5 == 0) (d % 100000) + 1 else -1L))
      var blocks = 0
      var rle = 0
      var bytesTotal = 0L
      var sum = 0L
      (0 until nf).foreach { j =>
        val nb = (2 + (d + j) % 3).toInt
        (0 until nb).foreach { k =>
          blocks += 1
          if ((d + j + k) % 2 == 0) {
            val len = (20 + (7 * d + 13 * k) % 100).toInt
            bytesTotal += len
            (0 until len).foreach(p => sum += (d + 31 * j + 17 * k + p) % 251)
          } else {
            rle += 1
            val len = (10 + (d + k) % 50).toInt
            bytesTotal += len
            sum += len * ((d + j + k) % 251)
          }
        }
      }
      assert(m.nBlocks == blocks && m.nRleBlocks == rle)
      assert(m.contentBytes == bytesTotal && m.contentSum == sum)
    }
  }

  test("both integrity ladders fail loudly") {
    // checksum: flip a content byte in an even-id (checksummed) stream
    val good = Zstd.synth(2L)
    val bad = good.clone()
    // the first raw block's bytes start after magic(4)+fhd(1)+
    // window(0/1)+fcs+blockhdr(3); flip deep inside the stream instead
    bad(bad.length - 10) = (bad(bad.length - 10) ^ 0x55).toByte
    intercept[IllegalArgumentException](Zstd.walk(bad))
    // compressed block type is the named boundary
    val frame = Zstd.synth(1L).clone()
    // find the first block header (magic+fhd+window+fcs) and set
    // btype=2: synth(1): frame 0 fhd has fcsFlag j%4=0, single when
    // (d+j)%3==0 -> d=1,j=0: not single -> window present, no fcs
    val hdrAt = 4 + 1 + 1
    frame(hdrAt) = ((frame(hdrAt) & ~0x06) | 0x04).toByte
    val e = intercept[IllegalArgumentException](Zstd.walk(frame))
    assert(e.getMessage.contains("compressed"), e.getMessage)
  }

  test("walk terminates loudly under random corruption") {
    val rng = new scala.util.Random(2848)
    for (trial <- 0 until 200) {
      val b = Zstd.synth((trial % 17).toLong).clone()
      (0 to rng.nextInt(4)).foreach { _ =>
        b(rng.nextInt(b.length)) = rng.nextInt(256).toByte
      }
      try { Zstd.walk(b); () }
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
