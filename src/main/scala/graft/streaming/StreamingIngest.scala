package graft.streaming

import graft.ops.MultimodalOps
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._

/** Streaming face of the multimodal binaryFile ingest
  * ([[graft.ops.MultimodalOps.ingestManifest]]) — the landing edge of a
  * continuously-fed media directory: Spark's file-stream source picks up
  * newly arrived files per trigger, each micro-batch emits its
  * content-addressed manifest rows (the SAME
  * [[graft.ops.MultimodalOps.manifestRows]] derivation as batch — one
  * definition, the edges cannot diverge), and every payload is checked
  * against a FROZEN digest index (yesterday's corpus — the boilerplate-
  * index idiom): `is_known` marks exact-duplicate payloads the corpus
  * already holds, the signal an ingest gate drops or routes on.
  *
  * State-free foreachBatch: the file-stream source's own checkpoint is
  * what makes "each file exactly once" durable; the digest index is a
  * broadcast-joined static frame (16-byte-digest rows); batch rows never
  * outlive their trigger. Within-batch duplicate RESOLUTION (canonical
  * survivor) stays a batch-compaction concern — a stream marks, it does
  * not rewrite.
  *
  * Scale notes: `maxFilesPerTrigger` (reader option) bounds per-trigger
  * work; content is dropped map-side right after the digest, so nothing
  * blob-sized crosses an exchange; the frozen index is a digest column —
  * broadcastable far beyond any payload volume.
  */
object StreamingIngest {

  /** binaryFile's fixed schema — a file STREAM source requires the
    * schema up front (unlike the batch reader, which infers it). */
  val binaryFileSchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

  /** Watch `dir` for new media files; per micro-batch, hand `sink` the
    * manifest rows (file_name, doc_id, modality, byte_len, digest,
    * is_known) where is_known = the payload digest exists in the frozen
    * `knownDigests` index (one `digest` column). */
  def manifestStream(spark: SparkSession, dir: String,
                     knownDigests: DataFrame)
                    (sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    val known = knownDigests.select(col("digest").as("k_digest"),
      lit(1L).as("k_hit"))
    val stream = spark.readStream.format("binaryFile")
      .schema(binaryFileSchema).load(dir)
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val m = MultimodalOps.manifestRows(batch)
        .join(broadcast(known), col("digest") === col("k_digest"), "left")
        .select(col("file_name"), col("doc_id"), col("modality"),
          col("byte_len"), col("digest"),
          col("k_hit").isNotNull.as("is_known"))
      sink(m, batchId)
    }
  }
}
