package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analysis.Multimodal

/** Real-codec multimodal path: the synthetic PNG/WAV corpora are genuine
  * encoded payloads, and decode / resize / feature-extract must agree with
  * the seeded generator exactly (PNG and PCM are lossless).
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)

  private def shaBytes(text: String): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256").digest(text.getBytes("UTF-8"))

  test("png: decodeImages recovers the seeded dimensions and exact channel means") {
    import spark.implicits._
    val expected = docs.select("doc_id", "text").as[(Long, String)].collect().map {
      case (id, text) =>
        val (w, h, argb) = Multimodal.imageSpec(shaBytes(text))
        var (sr, sg, sb) = (0L, 0L, 0L)
        for (y <- 0 until h; x <- 0 until w) {
          val p = argb(x, y)
          sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
        }
        val n = (w.toLong * h).toDouble
        id -> ((w, h, sr / n, sg / n, sb / n))
    }.toMap

    val got = Multimodal.decodeImages(Multimodal.syntheticPng(docs)).collect()
    assert(got.length === expected.size)
    got.foreach { m =>
      val (w, h, r, g, b) = expected(m.doc_id)
      assert((m.width, m.height) === ((w, h)), s"dims for ${m.doc_id}")
      assert(m.mean_r === r && m.mean_g === g && m.mean_b === b,
        s"channel means for ${m.doc_id}")
    }
  }

  test("png: ImageIoDecoder through the generic extractMeta path") {
    val metas = Multimodal.extractMeta(
      Multimodal.syntheticPng(docs), Multimodal.ImageIoDecoder).collect()
    import spark.implicits._
    val dims = docs.select("doc_id", "text").as[(Long, String)].collect().map {
      case (id, text) =>
        val (w, h, _) = Multimodal.imageSpec(shaBytes(text)); id -> ((w, h))
    }.toMap
    metas.foreach { m =>
      assert((m.width, m.height) === dims(m.doc_id))
      assert(m.header_hex === "8950") // PNG magic 0x89 'P'
    }
  }

  test("png: resize bounds the longest side, keeps small images byte-identical") {
    import spark.implicits._
    val bin = Multimodal.syntheticPng(docs)
    val resized = Multimodal.resizeImages(bin, maxDim = 16)
    val before = bin.select("doc_id", "payload").as[(Long, Array[Byte])]
      .collect().toMap
    val dims = Multimodal.decodeImages(resized).collect()
    dims.foreach { m =>
      assert(math.max(m.width, m.height) <= 16, s"doc ${m.doc_id} not bounded")
    }
    val after = resized.select("doc_id", "payload").as[(Long, Array[Byte])].collect().toMap
    val origDims = Multimodal.decodeImages(bin).collect().map(m => m.doc_id -> m).toMap
    after.foreach { case (id, bytes) =>
      val o = origDims(id)
      if (math.max(o.width, o.height) <= 16)
        assert(java.util.Arrays.equals(bytes, before(id)), s"doc $id re-encoded")
      else {
        // aspect preserved within rounding
        val m = dims.find(_.doc_id == id).get
        val scale = 16.0 / math.max(o.width, o.height)
        assert(m.width === math.max(1, math.round(o.width * scale).toInt))
        assert(m.height === math.max(1, math.round(o.height * scale).toInt))
      }
    }
  }

  test("wav: RIFF parse recovers header fields and exact RMS") {
    import spark.implicits._
    val got = Multimodal.decodeWav(Multimodal.syntheticWav(docs)).collect()
    val expected = docs.select("doc_id", "text").as[(Long, String)].collect().map {
      case (id, text) =>
        val shaHex = shaBytes(text).map(b => f"${b & 0xFF}%02x").mkString
        val b0 = Integer.parseInt(shaHex.substring(0, 2), 16)
        val b1 = Integer.parseInt(shaHex.substring(2, 4), 16)
        val n = 64 + b0 * 4
        val freq = 100.0 + b1 * 10.0
        val samples = Array.tabulate(n)(i =>
          math.round(12000.0 * math.sin(2 * math.Pi * freq * i / 8000)).toShort)
        val rms = math.sqrt(samples.map(s => s.toDouble * s).sum / n)
        id -> ((n.toLong, rms))
    }.toMap
    assert(got.length === expected.size)
    got.foreach { a =>
      val (n, rms) = expected(a.doc_id)
      assert(a.sample_rate === 8000 && a.channels === 1 && a.bits === 16)
      assert(a.n_samples === n)
      assert(math.abs(a.rms - rms) < 1e-9, s"rms for ${a.doc_id}")
      assert(math.abs(a.duration_ms - n * 1000.0 / 8000) < 1e-9)
    }
  }

  test("gif: multi-frame decode recovers seeded frame count, dims, exact pixels") {
    import spark.implicits._
    val expected = docs.select("doc_id", "text").as[(Long, String)].collect().map {
      case (id, text) =>
        val sha = shaBytes(text)
        val w = 4 + (sha(0) & 0x1F)
        val h = 4 + (sha(1) & 0x1F)
        val nFrames = 2 + ((sha(2) & 0xFF) % 8)
        // generator palette: index i -> gray 17*i, so mean_luma is the
        // exact mean of 17 * ((x + y + f + sha3) % 16) over all frames
        var s = 0.0
        for (f <- 0 until nFrames; y <- 0 until h; x <- 0 until w)
          s += 17.0 * ((x + y + f + (sha(3) & 0xFF)) % 16)
        id -> ((w, h, nFrames, s / (w.toLong * h * nFrames)))
    }.toMap

    val got = Multimodal.decodeGif(Multimodal.syntheticGif(docs)).collect()
    assert(got.length === expected.size)
    got.foreach { m =>
      val (w, h, n, luma) = expected(m.doc_id)
      assert((m.width, m.height) === ((w, h)), s"dims for ${m.doc_id}")
      assert(m.n_frames === n, s"frame count for ${m.doc_id}")
      assert(math.abs(m.mean_luma - luma) < 1e-9, s"luma for ${m.doc_id}")
    }
    val again = Multimodal.decodeGif(Multimodal.syntheticGif(docs)).collect()
      .map(m => m.doc_id -> ((m.width, m.height, m.n_frames, m.mean_luma))).toMap
    got.foreach(m => assert(
      again(m.doc_id) === ((m.width, m.height, m.n_frames, m.mean_luma))))
  }
}
