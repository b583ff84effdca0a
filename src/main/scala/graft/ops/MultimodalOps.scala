package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media asset: opaque binary payload + typed metadata — the multimodal
  * column pattern (SURVEY.md §7 B11). Image/audio/video travel as `binary`
  * columns; decode/feature-extract happens executor-side in typed batches.
  */
case class MediaAsset(doc_id: Long, payload: Array[Byte],
                      lang: String, source: String, n_chars: Long)

/** Extracted features for one asset. */
case class MediaFeatures(doc_id: Long, byte_len: Long, first_byte: Long,
                         checksum: Long, lang: String)

/** One asset after resize/downsample. */
case class ResizedAsset(doc_id: Long, orig_len: Long, new_len: Long,
                        resized_hex: String)

/** Multimodal column operators (SURVEY.md §7 B11).
  *
  * Real media decode libs aren't in this container, so [[decodeStub]] is a
  * deterministic fake (length / first byte / additive checksum) — but all
  * the Spark-side plumbing is real: binary payload column, typed
  * case-class Encoders, executor-side per-partition batch processing via
  * mapPartitions (the Scala analogue of mapInPandas — one iterator per
  * partition, so a real decoder would amortize model/codec init across the
  * batch), and metadata kept columnar next to the blob.
  *
  * Scale notes: blobs ride the scan but never a shuffle (all transforms
  * here are narrow); real pipelines keep payloads in their own parquet
  * column so column pruning skips them unless decoded, and size
  * `spark.sql.files.maxPartitionBytes` so a partition of blobs fits the
  * executor heap.
  */
object MultimodalOps {

  /** Pack documents into the multimodal shape: text bytes stand in for an
    * opaque media payload; metadata stays as typed columns.
    */
  def pack(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      col("lang"), col("source"),
      length(col("text")).cast("long").as("n_chars"))

  /** The decode/feature-extract stage: per-partition batches of typed
    * assets → features. A real image decoder would replace the body of the
    * iterator map; the signature, batching and schema are the production
    * shape.
    */
  def decodeStub(spark: SparkSession, packed: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    packed.as[MediaAsset].mapPartitions { assets =>
      // One-time per-partition init would go here (codec, model weights).
      assets.map { a =>
        val bytes = a.payload
        val checksum = bytes.foldLeft(0L)((acc, b) => acc + (b & 0xffL))
        MediaFeatures(a.doc_id, bytes.length.toLong,
          if (bytes.nonEmpty) (bytes(0) & 0xffL) else -1L, checksum, a.lang)
      }
    }
  }

  /** Frame sampling: extract every `stride`-th fixed-size chunk of the
    * opaque payload (≙ sampling video frames / audio windows before the
    * expensive decode). Pure byte arithmetic on the binary column —
    * map-side, and at scale it is the pruning step that keeps the decode
    * stage's input linear in SAMPLED frames, not raw bytes.
    */
  def sampleFrames(packed: DataFrame, frameSize: Int = 16, stride: Int = 4): DataFrame =
    packed
      // Empty payloads yield zero frames (sequence(0, -1) would otherwise
      // produce a descending [0,-1] array and emit one bogus empty frame).
      .filter(octet_length(col("payload")) > 0)
      .select(
        col("doc_id"),
        posexplode(expr(
          s"""transform(
             |  filter(sequence(0, CAST(floor((octet_length(payload) - 1) / $frameSize) AS INT)),
             |         i -> i % $stride = 0),
             |  i -> substring(payload, i * $frameSize + 1, $frameSize))""".stripMargin)))
      .select(col("doc_id"), col("pos").cast("long").as("frame_idx"),
        // hex, not raw binary: the compare harness hashes via pandas, which
        // cannot sort/factorize bytearray cells. Same hex() on the oracle.
        hex(col("col")).as("frame"))

  /** Frame-sampling oracle (payload is the text's bytes; ASCII, so
    * substring-on-text equals substring-on-blob). Range bound derives from
    * the longest document, not a hard cap; empty docs emit zero frames on
    * both sides.
    */
  val sampleFramesOracle: String =
    """SELECT doc_id, frame_idx, hex(encode(frame)) AS frame FROM (
      |  SELECT doc_id,
      |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS BIGINT) AS frame_idx,
      |    substr(text, i * 16 + 1, 16) AS frame
      |  FROM documents,
      |       (SELECT unnest(range(0,
      |          (SELECT CAST(max(octet_length(encode(text))) / 16 AS BIGINT) + 1
      |           FROM documents))) AS i) t
      |  WHERE i <= floor((octet_length(encode(text)) - 1) / 16)
      |    AND i % 4 = 0)""".stripMargin

  /** Resize/downsample: nearest-neighbor decimation of the opaque
    * payload (every `stride`-th byte — ≙ image downscale / audio
    * resample before featurization). Same executor-side typed-batch
    * shape as [[decodeStub]]: a real resampler (libvips/ffmpeg) replaces
    * the loop body; partition-batch init, narrow transform, blobs never
    * shuffle. Output payload as hex — compare-harness-stable, and the
    * 4× volume reduction is what the downstream decode stage scans.
    */
  def resizeStub(spark: SparkSession, packed: DataFrame, stride: Int = 4): Dataset[ResizedAsset] = {
    import spark.implicits._
    packed.as[MediaAsset].mapPartitions { assets =>
      assets.map { a =>
        val out = a.payload.indices.collect {
          case i if i % stride == 0 => a.payload(i)
        }
        ResizedAsset(a.doc_id, a.payload.length.toLong, out.length.toLong,
          out.map(b => f"${b & 0xff}%02X").mkString)
      }
    }
  }

  /** Resize oracle (ASCII text ≙ payload bytes): take every 4th char,
    * re-encode, hex — an independent list-based formulation.
    */
  val resizeOracle: String =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS orig_len,
      |  CAST(length(r) AS BIGINT) AS new_len,
      |  hex(encode(r)) AS resized_hex
      |FROM (
      |  SELECT doc_id, text,
      |    array_to_string(
      |      list_transform(list_filter(range(0, length(text)), i -> i % 4 = 0),
      |                     i -> substr(text, i + 1, 1)), '') AS r
      |  FROM documents)""".stripMargin

  /** End-to-end: pack → decode → features DataFrame. */
  def features(spark: SparkSession, documents: DataFrame): DataFrame =
    decodeStub(spark, pack(documents)).toDF()

  /** Oracle: the deterministic fake is reproducible in SQL over ASCII
    * text — byte length, first byte code point, sum of code points.
    */
  val featuresOracle: String =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      |  CAST(CASE WHEN length(text) > 0 THEN ascii(substr(text, 1, 1))
      |            ELSE -1 END AS BIGINT) AS first_byte,
      |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(range(1, length(text) + 1),
      |      i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))), (a, b) -> a + b)
      |    AS BIGINT) AS checksum,
      |  lang
      |FROM documents""".stripMargin
}
