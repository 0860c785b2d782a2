package graft

import graft.operators.Multimodal

/** Container goldens for the round-12 RIFF/AVI video path: the encoder
  * writes grammar-correct RIFF (magic, list tree, idx1 arithmetic), the
  * demuxer genuinely parses it back to the exact PNG frame bytes, a
  * decoded frame sample equals the pixel formula (lossless end-to-end),
  * and malformed containers fail loudly. */
class AviCodecSpec extends SparkSuite {

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def cc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  test("encoder writes grammar-correct RIFF: magic, sizes, idx1 entries") {
    val docId = 11L // video doc (11 % 3 == 2), 3 frames (2 + 11 % 5)
    val avi = Multimodal.encodeAvi(docId)
    assert(cc(avi, 0) == "RIFF" && cc(avi, 8) == "AVI ")
    // the RIFF size covers the file exactly (even-padded chunks)
    assert(8 + le32(avi, 4) == avi.length, "RIFF size mismatch")
    // hdrl first, with the stream headers naming vids/MPNG
    assert(cc(avi, 12) == "LIST" && cc(avi, 20) == "hdrl")
    val s = new String(avi, "ISO-8859-1")
    assert(s.contains("vids") && s.contains("MPNG"))
    // idx1 carries one 16-byte keyframe entry per frame, and each entry's
    // movi-relative offset lands on its '00dc' chunk
    val idxAt = s.indexOf("idx1")
    assert(idxAt > 0, "idx1 missing")
    val n = Multimodal.aviFrameCount(docId)
    assert(le32(avi, idxAt + 4) == 16 * n, "idx1 size != 16 * frames")
    val moviAt = s.indexOf("movi")
    (0 until n).foreach { i =>
      val e = idxAt + 8 + 16 * i
      assert(cc(avi, e) == "00dc" && le32(avi, e + 4) == 0x10)
      val off = le32(avi, e + 8)
      assert(cc(avi, moviAt + off) == "00dc",
        s"idx1 offset of frame $i does not land on a 00dc chunk")
    }
  }

  test("demux returns the exact PNG frame bytes; decode equals the formula") {
    val docId = 14L // 14 % 3 == 2, 6 frames (2 + 14 % 5)
    val avi = Multimodal.encodeAvi(docId)
    val frames = Multimodal.demuxAvi(avi)
    assert(frames.size == Multimodal.aviFrameCount(docId))
    frames.zipWithIndex.foreach { case (png, i) =>
      // PNG magic — the payload really is a PNG stream, not raw pixels
      assert((png(0) & 0xff) == 0x89 &&
        new String(png, 1, 3, "US-ASCII") == "PNG")
      val img = Multimodal.decodePng(png)
      assert(img.getWidth == Multimodal.AviW &&
        img.getHeight == Multimodal.AviH)
      val seed = Multimodal.aviFrameSeed(docId, i)
      (0 until Multimodal.AviH).foreach { y =>
        (0 until Multimodal.AviW).foreach { x =>
          assert(img.getRaster.getSample(x, y, 0) ==
            Multimodal.gradientPixel(x, y, seed),
            s"pixel ($x,$y) of frame $i diverged from the formula")
        }
      }
    }
  }

  test("malformed containers fail loudly, never silently empty") {
    val avi = Multimodal.encodeAvi(2L)
    // corrupt the RIFF magic
    val bad = avi.clone(); bad(0) = 'X'.toByte
    val e1 = intercept[IllegalArgumentException](Multimodal.demuxAvi(bad))
    assert(e1.getMessage.contains("RIFF"))
    // a container whose movi list is gone
    val noMovi = avi.clone()
    val s = new String(noMovi, "ISO-8859-1")
    val at = s.indexOf("movi")
    noMovi(at) = 'x'.toByte
    val e2 = intercept[IllegalArgumentException](Multimodal.demuxAvi(noMovi))
    assert(e2.getMessage.contains("movi"))
  }

  test("the frame-sample query aggregates genuinely decoded frames") {
    val df = Multimodal.frameSample(spark, sf0001).collect()
    assert(df.nonEmpty)
    df.foreach { r =>
      val n = r.getAs[Long]("n_sampled")
      assert(n >= 1 && n <= 3) // every 2nd of 2..6 frames
      assert(r.getAs[Long]("sampled_pixels") == n * 192L)
      // replay the formula driver-side for this doc
      val d = r.getAs[Long]("doc_id")
      val expect = (0 until Multimodal.aviFrameCount(d))
        .filter(_ % 2 == 0).map { i =>
          val seed = Multimodal.aviFrameSeed(d, i)
          (for (y <- 0 until Multimodal.AviH; x <- 0 until Multimodal.AviW)
            yield Multimodal.gradientPixel(x, y, seed).toLong).sum
        }.sum
      assert(r.getAs[Long]("sum_checksum") == expect,
        s"doc $d checksum diverged from the formula replay")
    }
  }
}
