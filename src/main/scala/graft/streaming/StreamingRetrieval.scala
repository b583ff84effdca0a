package graft.streaming

import graft.ops.RetrievalOps
import graft.sources.SnapshotSwap
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming maintenance of the persisted BM25 inverted index
  * ([[RetrievalOps.Bm25Index]]): a foreachBatch loop folds each
  * doc-disjoint micro-batch into the on-disk index so retrieval /
  * decontamination audits always query the live corpus without ever
  * re-tokenizing it — the lexical twin of
  * [[StreamingDedup.incrementalIndexLoop]] (MinHash) and the PQ index
  * append loop.
  *
  * On-disk layout under `indexDir`:
  *  - `postings/slice_<batchId>/` and `doclens/slice_<batchId>/` —
  *    one parquet slice per micro-batch, each written with
  *    mode=overwrite into its OWN batch-named subdirectory, so an
  *    at-least-once REPLAY (same batchId) overwrites byte-identical
  *    bytes instead of appending duplicates. Read back with
  *    `recursiveFileLookup` (plain subdirs, no partition inference).
  *  - `df/` — the vocabulary-sized document-frequency table, NOT
  *    appendable (it is a per-word SUM): each batch merges its delta
  *    df into a fresh generation published by crash-safe
  *    [[SnapshotSwap]] (retire-then-swap, `_SUCCESS`-gated recovery).
  *    The generation also carries an `_applied_batch_<id>` marker file
  *    (underscore-prefixed — parquet readers ignore it), making
  *    marker+data ATOMIC under the swap's single rename: a replayed
  *    batch whose marker is already in the live generation is skipped
  *    entirely, so df is never double-counted.
  *
  * Crash windows, all idempotent: crash after the postings/doclens
  * slice writes but before the df publish → replay overwrites the
  * slices (same bytes) and redoes the merge from the OLD generation;
  * crash mid-publish → [[SnapshotSwap.recover]] restores a complete
  * generation; crash after publish → the marker skips the replay.
  *
  * Scale: each trigger costs delta tokenization + a vocab-sized df
  * merge-rewrite — independent of accumulated postings volume. The
  * slice count grows one-per-trigger; [[compactBm25Index]] bounds it.
  */
object StreamingRetrieval {

  private def appliedMarker(dfDir: String, batchId: Long) =
    s"_applied_batch_$batchId"

  private def hadoopFs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Fold one doc-disjoint document slice into the on-disk index.
    * Exposed (rather than buried in the foreachBatch closure) so specs
    * can drive replay scenarios directly. Returns false iff the batch
    * was recognized as already applied and skipped. */
  def foldBatch(spark: SparkSession, docs: DataFrame, batchId: Long,
                indexDir: String): Boolean = {
    val dfDir = s"$indexDir/df"
    val exists = SnapshotSwap.recover(spark, dfDir)
    val fs = hadoopFs(spark, indexDir)
    if (exists && fs.exists(new org.apache.hadoop.fs.Path(
        dfDir, appliedMarker(dfDir, batchId))))
      return false
    val delta = RetrievalOps.bm25BuildIndex(docs)
    delta.postings.write.mode("overwrite")
      .parquet(s"$indexDir/postings/slice_$batchId")
    delta.doclens.write.mode("overwrite")
      .parquet(s"$indexDir/doclens/slice_$batchId")
    val mergedDf =
      if (exists) RetrievalOps.mergeDf(spark.read.parquet(dfDir), delta.df)
      else delta.df
    val tmp = SnapshotSwap.nextPath(dfDir)
    mergedDf.write.mode("overwrite").parquet(tmp)
    fs.create(new org.apache.hadoop.fs.Path(tmp,
      appliedMarker(dfDir, batchId)), true).close()
    SnapshotSwap.publish(spark, dfDir)
    true
  }

  /** The streaming loop: `stream` must carry (doc_id, text) with
    * doc-disjoint micro-batches (the incremental-merge contract —
    * df additivity needs each document in exactly one slice). */
  def bm25IndexStream(spark: SparkSession, stream: DataFrame,
                      indexDir: String): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      foldBatch(spark,
        batch.select(col("doc_id").cast("long"), col("text")), batchId,
        indexDir)
      ()
    }

  /** Read the streamed on-disk index back as a queryable
    * [[RetrievalOps.Bm25Index]] (recursive lookup over the slice
    * subdirectories; columns selected explicitly so layout details
    * never leak into the schema). */
  def readStreamedIndex(spark: SparkSession,
                        indexDir: String): RetrievalOps.Bm25Index = {
    def rec(sub: String) = spark.read
      .option("recursiveFileLookup", "true").parquet(s"$indexDir/$sub")
    SnapshotSwap.recover(spark, s"$indexDir/df")
    RetrievalOps.Bm25Index(
      rec("postings").select("doc_id", "word", "tf"),
      rec("doclens").select("doc_id", "dl"),
      spark.read.parquet(s"$indexDir/df").select("word", "df"))
  }

  /** Periodic compaction: rewrite the accumulated postings/doclens
    * slices as `numFiles` large files each (one generation swap per
    * table; df is already one vocab-sized generation). No distinct(),
    * no re-aggregation — slices are doc-disjoint by contract and
    * replays overwrite in place, so rows are already unique; this is
    * purely a small-files rewrite. CONCURRENCY CONTRACT: run only
    * while the appending loop is quiescent (same as
    * [[StreamingDedup.compactSignatureIndex]]). Returns the postings
    * file count (before, after). */
  def compactBm25Index(spark: SparkSession, indexDir: String,
                       numFiles: Int = 8): (Long, Long) = {
    def files(sub: String): Long = {
      val it = hadoopFs(spark, indexDir).listFiles(
        new org.apache.hadoop.fs.Path(s"$indexDir/$sub"), true)
      var n = 0L
      while (it.hasNext) {
        if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      }
      n
    }
    val before = files("postings")
    for (sub <- Seq("postings", "doclens")) {
      val dir = s"$indexDir/$sub"
      val tmp = SnapshotSwap.nextPath(dir)
      spark.read.option("recursiveFileLookup", "true").parquet(dir)
        .repartition(numFiles).write.mode("overwrite").parquet(tmp)
      SnapshotSwap.publish(spark, dir)
    }
    (before, files("postings"))
  }
}
