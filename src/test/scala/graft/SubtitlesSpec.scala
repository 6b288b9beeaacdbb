package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Subtitles

class SubtitlesSpec extends AnyFunSuite {

  test("SRT and VTT fixtures parse to identical expected features") {
    for (d <- 0L to 60L) {
      val (n, text, total, first, last) = Subtitles.expected(d)
      for ((label, doc) <- Seq(
          "srt" -> Subtitles.parseSrt(Subtitles.synthSrt(d)),
          "vtt" -> Subtitles.parseVtt(Subtitles.synthVtt(d)))) {
        assert(doc.nCues == n, s"$label d=$d")
        assert(doc.text == text, s"$label d=$d")
        assert(doc.totalMs == total, s"$label d=$d")
        assert(doc.firstStartMs == first, s"$label d=$d")
        assert(doc.lastEndMs == last, s"$label d=$d")
      }
    }
  }

  test("format quirks: comma vs dot, hours, settings, CRLF, NOTE") {
    // SRT with hours and CRLF line endings
    val srt = "1\r\n01:02:03,456 --> 01:02:04,000\r\nhello\r\n"
    val d1 = Subtitles.parseSrt(srt)
    assert(d1.cues.head.startMs ==
      ((1 * 60 + 2) * 60 + 3) * 1000L + 456)
    // VTT with full-hours timestamps and a cue settings list
    val vtt = "WEBVTT\n\n00:00:01.000 --> 00:00:02.000 align:start\nhi\n"
    assert(Subtitles.parseVtt(vtt).cues.head.text == "hi")
    // NOTE blocks are skipped
    val vtt2 = "WEBVTT\n\nNOTE a comment\nspanning lines\n\n" +
      "00:01.000 --> 00:02.000\nx\n"
    assert(Subtitles.parseVtt(vtt2).nCues == 1)
  }

  test("malformed inputs fail loudly") {
    // SRT index gap
    intercept[IllegalArgumentException] {
      Subtitles.parseSrt("2\n00:00:01,000 --> 00:00:02,000\nx\n")
    }
    // end before start
    intercept[IllegalArgumentException] {
      Subtitles.parseSrt("1\n00:00:02,000 --> 00:00:01,000\nx\n")
    }
    // non-monotonic cue starts
    intercept[IllegalArgumentException] {
      Subtitles.parseSrt("1\n00:00:05,000 --> 00:00:06,000\nx\n\n" +
        "2\n00:00:01,000 --> 00:00:02,000\ny\n")
    }
    // dot decimal in SRT (wrong separator)
    intercept[IllegalArgumentException] {
      Subtitles.parseSrt("1\n00:00:01.000 --> 00:00:02.000\nx\n")
    }
    // missing WEBVTT header
    intercept[IllegalArgumentException] {
      Subtitles.parseVtt("00:01.000 --> 00:02.000\nx\n")
    }
    // cue with no text
    intercept[IllegalArgumentException] {
      Subtitles.parseSrt("1\n00:00:01,000 --> 00:00:02,000\n")
    }
    // 2-digit millis
    intercept[IllegalArgumentException] {
      Subtitles.parseSrt("1\n00:00:01,00 --> 00:00:02,000\nx\n")
    }
    // seconds field out of range
    intercept[IllegalArgumentException] {
      Subtitles.parseSrt("1\n00:00:61,000 --> 00:01:02,000\nx\n")
    }
  }

  test("round-trip property: parseSrt(encodeSrt(cues)) == cues") {
    val rng = new scala.util.Random(31)
    val alphabet = "abz09 :,->()#."
    for (trial <- 0 until 200) {
      var t = rng.nextInt(5000).toLong
      val cues = (0 until 1 + rng.nextInt(5)).map { _ =>
        val start = t + rng.nextInt(3000)
        val end = start + 1 + rng.nextInt(5000)
        t = start // next start must be >= this one (monotonic)
        val lines = (0 until 1 + rng.nextInt(3)).map { _ =>
          "x" + new String(Array.fill(rng.nextInt(10))(
            alphabet(rng.nextInt(alphabet.length)))).trim
        }
        (start, end, lines)
      }.sortBy(_._1)
      val doc = Subtitles.parseSrt(Subtitles.encodeSrt(cues))
      assert(doc.nCues == cues.length, s"trial=$trial")
      doc.cues.zip(cues).foreach { case (got, (a, b, lines)) =>
        assert(got.startMs == a && got.endMs == b, s"trial=$trial")
        assert(got.text == lines.map(_.trim).mkString(" "), s"trial=$trial")
      }
    }
  }

  test("parser terminates loudly under corruption") {
    val rng = new scala.util.Random(5)
    for (trial <- 0 until 300) {
      val base =
        if (trial % 2 == 0) Subtitles.synthSrt((trial % 9).toLong)
        else Subtitles.synthVtt((trial % 9).toLong)
      val chars = base.toCharArray
      (0 to rng.nextInt(5)).foreach { _ =>
        chars(rng.nextInt(chars.length)) =
          "0123456789:,.->\n abc"(rng.nextInt(20))
      }
      val s = new String(chars)
      try {
        if (trial % 2 == 0) Subtitles.parseSrt(s)
        else Subtitles.parseVtt(s)
        ()
      } catch {
        case e: RuntimeException
            if e.isInstanceOf[IllegalArgumentException] ||
              e.getClass == classOf[RuntimeException] => ()
        case other: Throwable =>
          fail(s"trial $trial: ${other.getClass.getName}: " +
            s"${other.getMessage}", other)
      }
    }
  }
}
