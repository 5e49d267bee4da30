package graft.analysis

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal record: an opaque binary payload + typed metadata. */
case class BinaryDoc(doc_id: Long, kind: String, payload: Array[Byte])

/** Extracted features for one payload. */
case class BinaryMeta(doc_id: Long, kind: String, n_bytes: Long,
                      header_hex: String, width: Int, height: Int,
                      payload_sha: String)

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The Spark side is real — schema, partitioning, batch iteration, and
  * the metadata contract are what a production pipeline needs. The codec
  * step is STUBBED: this container has no image/audio libraries, so
  * [[StubDecoder]] derives deterministic fake dimensions from the payload
  * header instead of actually decoding pixels. Swap [[Decoder]]
  * implementations to plug in a real codec; everything else is unchanged.
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
