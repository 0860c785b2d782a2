package graft

import graft.operators.Multimodal

/** Goldens for the REAL image codec path (encode → PNG bytes → ImageIO
  * decode must reproduce the gradient formula bit-exactly — what makes the
  * decode oracle-able) plus determinism of the aggregated faces. */
class MultimodalSpec extends SparkSuite {

  test("PNG roundtrip: decoded raster equals the gradient formula, pixel for pixel") {
    val d = 7L
    val (w, h) = Multimodal.pngDims(d)
    val bytes = Multimodal.encodePng(w, h, d)
    // a real PNG: magic bytes, not a raw buffer
    assert((bytes(0) & 0xFF) == 0x89 &&
      new String(bytes.slice(1, 4), "US-ASCII") == "PNG")
    val img = Multimodal.decodePng(bytes)
    assert((img.getWidth, img.getHeight) == ((w, h)))
    val raster = img.getRaster
    for (y <- 0 until h; x <- 0 until w)
      assert(raster.getSample(x, y, 0) == Multimodal.gradientPixel(x, y, d),
        s"pixel ($x,$y) lost in the encode/decode roundtrip")
  }

  test("resize golden: hand-computed 4x4 gradient -> 2x2 box filter") {
    // doc_id 0, 4x4: pixel(x,y) = x + 2y; rows [0,1,2,3] [2,3,4,5]
    // [4,5,6,7] [6,7,8,9]; blocks (0+1+2+3)/4=1, (2+3+4+5)/4=3,
    // (4+5+6+7)/4=5, (6+7+8+9)/4=7 → checksum 16
    val img = Multimodal.decodePng(Multimodal.encodePng(4, 4, 0L))
    val r = img.getRaster
    var checksum = 0L
    for (orow <- 0 until 2; ocol <- 0 until 2)
      checksum += (r.getSample(ocol * 2, orow * 2, 0) +
        r.getSample(ocol * 2 + 1, orow * 2, 0) +
        r.getSample(ocol * 2, orow * 2 + 1, 0) +
        r.getSample(ocol * 2 + 1, orow * 2 + 1, 0)) / 4
    assert(checksum == 16L)
  }

  test("decoded-pixel aggregations are deterministic across runs") {
    val a = Multimodal.resizeAgg(spark, sf0001).collect().map(_.toString).sorted
    val b = Multimodal.resizeAgg(spark, sf0001).collect().map(_.toString).sorted
    assert(a.nonEmpty && (a sameElements b))
    val m1 = Multimodal.pngMeta(spark, sf0001).collect().map(_.toString).sorted
    val m2 = Multimodal.pngMeta(spark, sf0001).collect().map(_.toString).sorted
    assert(m1.nonEmpty && (m1 sameElements m2))
  }

  test("WAV roundtrip: real RIFF container, decoded PCM equals the tone formula") {
    Seq(0L, 7L, 31L, 123L).foreach { d =>
      val bytes = Multimodal.encodeWav(d)
      // a REAL RIFF/WAVE file, not a raw PCM dump
      assert(new String(bytes.take(4), "US-ASCII") == "RIFF" &&
        new String(bytes.slice(8, 12), "US-ASCII") == "WAVE",
        s"doc $d did not encode as a RIFF/WAVE container")
      assert(bytes.length > Multimodal.toneLength(d) * 2,
        "no container overhead — encode looks like bare PCM")
      // genuine decode reproduces the formula sample for sample
      val decoded = Multimodal.decodeWav(bytes)
      val expected = Array.tabulate(Multimodal.toneLength(d))(i =>
        Multimodal.toneSample(i, d))
      assert(decoded.sameElements(expected),
        s"doc $d decoded PCM diverged from the tone formula")
    }
  }

  test("audio feature golden: doc 0 peak/energy/crossings from decoded samples") {
    // doc 0: n = 256, k = 3 → sawtooth (3i % 4096) - 2048 over i < 256;
    // samples span [-2048, -1283]: all negative → peak 2048, 0 crossings
    val row = Multimodal.audioFeatures(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("doc_id") === 0L)
      .head()
    val s = Array.tabulate(256)(i => Multimodal.toneSample(i, 0L))
    assert(row.getAs[Long]("n_samples") == 256L)
    assert(row.getAs[Long]("peak") == s.map(v => math.abs(v.toLong)).max)
    assert(row.getAs[Long]("energy") ==
      s.map(v => v.toLong * v.toLong).sum)
    assert(row.getAs[Long]("crossings") ==
      (1 until 256).count(i => (s(i - 1) >= 0) != (s(i) >= 0)).toLong)
    // determinism across runs (encode + decode are pure)
    val a = Multimodal.audioFeatures(spark, sf0001).collect()
      .map(_.toString).sorted
    val b = Multimodal.audioFeatures(spark, sf0001).collect()
      .map(_.toString).sorted
    assert(a.nonEmpty && (a sameElements b))
  }
}
