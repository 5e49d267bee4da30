package graft.analysis

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal record: an opaque binary payload + typed metadata. */
case class BinaryDoc(doc_id: Long, kind: String, payload: Array[Byte])

/** Extracted features for one payload. */
case class BinaryMeta(doc_id: Long, kind: String, n_bytes: Long,
                      header_hex: String, width: Int, height: Int,
                      payload_sha: String)

/** Decoded image record: dimensions + per-channel means (the canonical
  * cheap feature vector slice).
  */
case class ImageMeta(doc_id: Long, width: Int, height: Int,
                     mean_r: Double, mean_g: Double, mean_b: Double)

/** Decoded audio record: PCM header fields + RMS amplitude. */
case class AudioMeta(doc_id: Long, sample_rate: Int, channels: Int,
                     bits: Int, n_samples: Long, duration_ms: Double,
                     rms: Double)

/** Decoded multi-frame (video-shaped) record: dimensions of the first
  * frame, frame count, mean luma over all frames' pixels.
  */
case class VideoMeta(doc_id: Long, width: Int, height: Int,
                     n_frames: Int, mean_luma: Double)

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The Spark side is real — schema, partitioning, batch iteration, and
  * the metadata contract are what a production pipeline needs. The codec
  * step is REAL for every declared modality, using only what the JVM
  * ships: image = PNG decode / resize / channel-mean features via
  * `javax.imageio` (java.desktop, headless-safe raster ops only);
  * audio = WAV/PCM parse + RMS via a hand-rolled RIFF reader;
  * video-shaped multi-frame = animated GIF frame walk ([[decodeGif]]).
  * [[StubDecoder]] survives only as the cheap pluggability/test
  * stand-in for [[extractMeta]]'s Decoder seam — swap [[Decoder]]
  * implementations to plug a real external codec in; everything else is
  * unchanged.
  */
object Multimodal {

  /** Pluggable decode step (the `mapInPandas` batch-UDF analog: one call
    * per record, invoked inside mapPartitions so implementations can
    * amortize per-batch setup — model load, codec init — across a
    * partition).
    */
  trait Decoder extends Serializable {
    def decode(payload: Array[Byte]): (Int, Int) // (width, height)
  }

  /** STUB: fake "decode" deriving dimensions from the first two header
    * bytes — deterministic and cheap; NOT a real image decoder.
    */
  object StubDecoder extends Decoder {
    def decode(payload: Array[Byte]): (Int, Int) = {
      val b0 = if (payload.length > 0) payload(0) & 0xFF else 0
      val b1 = if (payload.length > 1) payload(1) & 0xFF else 0
      (1 + b0 % 64, 1 + b1 % 64)
    }
  }

  /** REAL image decode via the JDK's ImageIO (PNG/BMP/GIF/JPEG — the
    * java.desktop module ships the codecs; raster-only, headless-safe).
    */
  object ImageIoDecoder extends Decoder {
    def decode(payload: Array[Byte]): (Int, Int) = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) (0, 0) else (img.getWidth, img.getHeight)
    }
  }

  /** Deterministic pixel generator shared by the synthetic corpus and the
    * specs: seeded LCG over sha256(text) -> (width, height, argb(x, y)).
    */
  private[graft] def imageSpec(textSha: Array[Byte]): (Int, Int, (Int, Int) => Int) = {
    val w = 1 + (textSha(0) & 0x3F)
    val h = 1 + (textSha(1) & 0x3F)
    val seed = java.nio.ByteBuffer.wrap(textSha, 2, 8).getLong
    val argb = (x: Int, y: Int) => {
      var s = seed ^ (x * 2654435761L + y * 40503L)
      s = s * 6364136223846793005L + 1442695040888963407L
      0xFF000000 | (((s >>> 40) & 0xFFFFFF).toInt)
    }
    (w, h, argb)
  }

  /** Deterministic synthetic PNG corpus: per doc, a small seeded RGB
    * image encoded as real PNG bytes (on the executors, one codec per
    * partition). Gives the decode/resize/feature operators true image
    * payloads without external data.
    */
  def syntheticPng(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), sha2(col("text"), 256).as("sha"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, shaHex) =>
          val sha = shaHex.sliding(2, 2).map(Integer.parseInt(_, 16).toByte).toArray
          val (w, h, argb) = imageSpec(sha)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, argb(x, y)); x += 1 }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (id, "image", bos.toByteArray)
        }
      }.toDF("doc_id", "kind", "payload")
  }

  /** Real decode + channel-mean features over a binary image column
    * (mapPartitions batches; ImageIO reader reused per task).
    */
  def decodeImages(bin: DataFrame): Dataset[ImageMeta] = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col("doc_id").cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
          if (img == null) ImageMeta(id, 0, 0, 0, 0, 0)
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            var (sr, sg, sb) = (0L, 0L, 0L)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = img.getRGB(x, y)
                sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
                x += 1
              }
              y += 1
            }
            // Long multiply: a real >=2^31-pixel image would overflow the
            // Int product and corrupt the channel means (the Long sums
            // above were already safe; the divisor must be too)
            val n = (w.toLong * h).toDouble
            ImageMeta(id, w, h, sr / n, sg / n, sb / n)
          }
        }
      }
  }

  /** Real resize: longest side scaled to `maxDim` (never upscaled),
    * bilinear, re-encoded as PNG — the canonical pre-training image
    * normalization step. Output schema matches the input binary column
    * contract so stages compose.
    */
  def resizeImages(bin: DataFrame, maxDim: Int): DataFrame = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col("doc_id").cast("long"), col("kind"), col("payload"))
      .as[BinaryDoc]
      .mapPartitions { it =>
        it.map { d =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(d.payload))
          if (img == null) (d.doc_id, d.kind, d.payload)
          else {
            val scale = maxDim.toDouble / math.max(img.getWidth, img.getHeight)
            if (scale >= 1.0) (d.doc_id, d.kind, d.payload)
            else {
              val nw = math.max(1, math.round(img.getWidth * scale).toInt)
              val nh = math.max(1, math.round(img.getHeight * scale).toInt)
              val out = new java.awt.image.BufferedImage(
                nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, nw, nh, null)
              g.dispose()
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", bos)
              (d.doc_id, d.kind, bos.toByteArray)
            }
          }
        }
      }.toDF("doc_id", "kind", "payload")
  }

  /** Deterministic synthetic WAV corpus: 16-bit PCM mono sine, frequency
    * and length seeded from sha256(text) — real RIFF/WAVE bytes.
    */
  def syntheticWav(docs: DataFrame, sampleRate: Int = 8000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), sha2(col("text"), 256).as("sha"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, shaHex) =>
          val b0 = Integer.parseInt(shaHex.substring(0, 2), 16)
          val b1 = Integer.parseInt(shaHex.substring(2, 4), 16)
          val n = 64 + b0 * 4                      // 64..1084 samples
          val freq = 100.0 + b1 * 10.0             // Hz
          val amp = 12000.0
          val samples = Array.tabulate(n)(i =>
            math.round(amp * math.sin(2 * math.Pi * freq * i / sampleRate)).toShort)
          (id, "audio", wavBytes(samples, sampleRate))
        }
      }.toDF("doc_id", "kind", "payload")
  }

  /** Minimal RIFF/WAVE writer: PCM16 mono. */
  private[analysis] def wavBytes(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)                    // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)  // byte rate
      .putShort(2).putShort(16)                   // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Real WAV/PCM parse (hand-rolled RIFF walk — no libraries): header
    * fields + RMS amplitude over the PCM16 samples.
    */
  def decodeWav(bin: DataFrame): Dataset[AudioMeta] = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col("doc_id").cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val bb = java.nio.ByteBuffer.wrap(payload)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          if (payload.length < 44 ||
              new String(payload, 0, 4, "US-ASCII") != "RIFF" ||
              new String(payload, 8, 4, "US-ASCII") != "WAVE")
            AudioMeta(id, 0, 0, 0, 0L, 0.0, 0.0)
          else {
            // chunk walk: find fmt and data wherever they sit
            var pos = 12
            var rate = 0; var channels = 0; var bits = 0
            var dataOff = -1; var dataLen = 0
            while (pos + 8 <= payload.length) {
              val cid = new String(payload, pos, 4, "US-ASCII")
              val clen = bb.getInt(pos + 4)
              if (clen < 0 || clen > payload.length - pos - 8) pos = payload.length
              else {
                if (cid == "fmt ") {
                  channels = bb.getShort(pos + 10).toInt
                  rate = bb.getInt(pos + 12)
                  bits = bb.getShort(pos + 22).toInt
                } else if (cid == "data") { dataOff = pos + 8; dataLen = clen }
                pos += 8 + clen + (clen & 1)
              }
            }
            if (dataOff < 0 || bits != 16 || channels < 1 || rate <= 0)
              AudioMeta(id, rate, channels, bits, 0L, 0.0, 0.0)
            else {
              val n = dataLen / 2
              var sumSq = 0.0
              var i = 0
              while (i < n) {
                val s = bb.getShort(dataOff + 2 * i).toDouble
                sumSq += s * s
                i += 1
              }
              val frames = n / channels
              AudioMeta(id, rate, channels, bits, frames.toLong,
                frames * 1000.0 / rate, math.sqrt(sumSq / math.max(n, 1)))
            }
          }
        }
      }
  }

  /** Deterministic synthetic animated-GIF corpus: per doc, a small
    * multi-frame GIF (2..9 frames, seeded size/palette drift from
    * sha256(text)) written with ImageIO's sequence writer — a REAL
    * multi-frame container, the codec-level stand-in for video
    * frame-sampling (GIF is the one multi-frame format the JDK both
    * encodes and decodes with no external deps).
    */
  def syntheticGif(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), sha2(col("text"), 256).as("sha"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, shaHex) =>
          val sha = shaHex.sliding(2, 2).map(Integer.parseInt(_, 16).toByte).toArray
          val w = 4 + (sha(0) & 0x1F)            // 4..35 px
          val h = 4 + (sha(1) & 0x1F)
          val nFrames = 2 + ((sha(2) & 0xFF) % 8) // 2..9 frames
          val bos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          val writer = javax.imageio.ImageIO
            .getImageWritersByFormatName("gif").next()
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          // interlace off: the JDK GIF codec mis-permutes interlaced rows
          // for frames shorter than the 8-row interlace stride
          val param = writer.getDefaultWriteParam
          param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
          // explicit gray palette (index i < 16 -> gray 17*i): GIF stores
          // palettes losslessly, so decoded pixels — not just counts and
          // dims — are exactly the generator's (spec-pinned). The table
          // is a full 256 entries on purpose: with <= 16 colors the JDK
          // GIF writer emits 4-bit LZW codes and scrambles rows at
          // non-byte-aligned widths; 256 entries force 8-bit codes
          val grays = Array.tabulate(256)(i => if (i < 16) (i * 17).toByte else 0.toByte)
          val cm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
          var f = 0
          while (f < nFrames) {
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                img.getRaster.setSample(x, y, 0,
                  (x + y + f + (sha(3) & 0xFF)) % 16)
                x += 1
              }
              y += 1
            }
            writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), param)
            f += 1
          }
          writer.endWriteSequence()
          writer.dispose()
          ios.close()
          (id, "video", bos.toByteArray)
        }
      }.toDF("doc_id", "kind", "payload")
  }

  /** Real multi-frame decode over a binary GIF column: frame count via
    * the ImageIO reader's index walk, dimensions of frame 0, and the mean
    * luma over every pixel of every frame — the frame-sample feature
    * extraction shape (swap GIF for a real video codec; the Spark-side
    * batching, schema, and per-partition reader reuse are identical).
    */
  def decodeGif(bin: DataFrame): Dataset[VideoMeta] = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col("doc_id").cast("long"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val reader = javax.imageio.ImageIO
          .getImageReadersByFormatName("gif").next() // reused per task
        it.map { case (id, payload) =>
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(payload))
          try {
            reader.setInput(iis, false, true)
            val n = reader.getNumImages(true)
            if (n <= 0) VideoMeta(id, 0, 0, 0, 0.0)
            else {
              val first = reader.read(0)
              var lumaSum = 0.0
              var pixels = 0L
              var f = 0
              while (f < n) {
                val img = reader.read(f)
                var y = 0
                while (y < img.getHeight) {
                  var x = 0
                  while (x < img.getWidth) {
                    val p = img.getRGB(x, y)
                    lumaSum += (((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)) / 3.0
                    x += 1
                  }
                  y += 1
                }
                pixels += img.getWidth.toLong * img.getHeight
                f += 1
              }
              VideoMeta(id, first.getWidth, first.getHeight, n,
                lumaSum / math.max(pixels, 1L))
            }
          } catch {
            case _: Exception => VideoMeta(id, 0, 0, 0, 0.0)
          } finally iis.close()
        }
      }
  }

  /** Deterministic synthetic binary corpus derived from documents(text):
    * payload = the 16 md5 bytes of the text (a stand-in for real image
    * bytes so the pipeline shape is testable without external data).
    */
  def syntheticBinary(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      lit("image").as("kind"),
      unhex(md5(col("text"))).as("payload"))

  /** Batch feature extraction over the binary column. Runs as
    * mapPartitions so a real decoder pays its setup once per partition;
    * the output schema is the typed metadata contract.
    */
  def extractMeta(bin: DataFrame, decoder: Decoder = StubDecoder): Dataset[BinaryMeta] = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.select(col("doc_id").cast("long"), col("kind"), col("payload"))
      .as[BinaryDoc]
      .mapPartitions { it =>
        // per-partition setup would go here (codec/model init)
        it.map { d =>
          val payload = if (d.payload == null) Array.emptyByteArray else d.payload
          val (w, h) = decoder.decode(payload)
          val hex = payload.take(2).map(b => f"${b & 0xFF}%02x").mkString
          BinaryMeta(d.doc_id, d.kind, payload.length.toLong, hex, w, h,
            graft.index.Sha.hex256Bytes(payload))
        }
      }
  }

  /** SQL-mirrorable slice of the metadata (no decode): payload length +
    * header hex — used by the DuckDB oracle to validate the binary
    * plumbing end-to-end.
    */
  def metaSql(docs: DataFrame): DataFrame =
    syntheticBinary(docs).select(
      col("doc_id"),
      length(col("payload")).cast("long").as("n_bytes"),
      substring(hex(col("payload")), 1, 4).as("header_hex"))
}
