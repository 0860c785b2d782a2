package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow

/** Golden + determinism tests for the multimodal stubs whose pixel walks
  * aren't SQL-expressible (the driver records rows-only checks for them). */
class MultimodalSpec extends SparkSuite {

  test("resize stub: hand-computed 4x4 -> 2x2 box filter golden") {
    // grid rows: [0,4,8,12] [16,20,24,28] [32,36,40,44] [48,52,56,60]
    val content = Array.tabulate[Byte](16)(i => (i * 4).toByte)
    val out = Multimodal.resizeForTest(Seq(
      MediaRow(1L, content, "image/png", 4, 4)))
    assert(out.size == 1)
    val r = out.head
    assert((r.out_w, r.out_h, r.out_bytes) == ((2, 2, 4L)))
    // blocks: (0+4+16+20)/4=10, (8+12+24+28)/4=18, (32+36+48+52)/4=42,
    // (40+44+56+60)/4=50 → checksum 120
    assert(r.checksum == 120L)
  }

  test("resize stub skips non-images and handles short blobs") {
    val out = Multimodal.resizeForTest(Seq(
      MediaRow(1L, Array[Byte](1, 2, 3), "audio/wav", 4, 4),
      MediaRow(2L, Array[Byte](1, 2, 3), "image/png", 4, 4)))
    assert(out.map(_.doc_id) == Seq(2L))
    assert(out.head.out_h == 0 && out.head.checksum == 0L)
  }

  test("resize aggregation is deterministic across runs") {
    val a = Multimodal.resizeAgg(spark, sf0001).collect().map(_.toString).sorted
    val b = Multimodal.resizeAgg(spark, sf0001).collect().map(_.toString).sorted
    assert(a.nonEmpty && (a sameElements b))
  }
}
