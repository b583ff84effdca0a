package graft

import graft.ops.RetrievalOps
import graft.streaming.StreamingRetrieval
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming BM25 index maintenance: the on-disk index after N
  * doc-disjoint micro-batches answers queries bit-identically to a
  * full rebuild; replays are idempotent; compaction bounds files. */
class StreamingRetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def corpus: DataFrame = Seq(
    (0L, "apple banana cherry date"),
    (1L, "banana banana cherry elder fig"),
    (2L, "apple apple grape haw iris"),
    (3L, "cherry date elder fig grape"),
    (4L, "iris jack kiwi lemon apple"),
    (5L, "date date date elder haw jack"),
    (6L, "kiwi lemon mango nut olive"),
    (7L, "apple banana date fig haw kiwi"),
    (8L, "apple banana date fig haw kiwi"),
    (9L, "mango nut olive pear quince")).toDF("doc_id", "text")

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def ranksFromDisk(dir: String): Seq[String] =
    sortedRows(RetrievalOps.bm25RanksFromIndex(
      StreamingRetrieval.readStreamedIndex(spark, dir),
      RetrievalOps.queryTerms(corpus, col("doc_id") < 3), k = 5))

  private def rebuiltRanks: Seq[String] =
    sortedRows(RetrievalOps.bm25Ranks(corpus, col("doc_id") < 3, k = 5))

  private def withDir(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("bm25stream").toString
    try f(dir)
    finally graft.ops.FixtureDirs.rmTree(java.nio.file.Paths.get(dir))
  }

  test("streamed index over 3 micro-batches == full rebuild, bit-identical") {
    withDir { dir =>
      implicit val sq = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val query = StreamingRetrieval.bm25IndexStream(spark,
          input.toDF().toDF("doc_id", "text"), dir)
        .option("checkpointLocation", dir + "/ckpt").start()
      try {
        val docs = corpus.as[(Long, String)].collect()
        input.addData(docs.filter(_._1 % 3 == 0).toSeq: _*)
        query.processAllAvailable()
        input.addData(docs.filter(_._1 % 3 == 1).toSeq: _*)
        query.processAllAvailable()
        input.addData(docs.filter(_._1 % 3 == 2).toSeq: _*)
        query.processAllAvailable()
      } finally query.stop()
      assert(ranksFromDisk(dir) == rebuiltRanks)
    }
  }

  test("replaying a batch (same batchId) is skipped: df not double-counted, " +
    "postings byte-stable") {
    withDir { dir =>
      val b0 = corpus.filter(col("doc_id") < 5)
      val b1 = corpus.filter(col("doc_id") >= 5)
      assert(StreamingRetrieval.foldBatch(spark, b0, 0L, dir))
      assert(StreamingRetrieval.foldBatch(spark, b1, 1L, dir))
      val before = ranksFromDisk(dir)
      val dfBefore = sortedRows(spark.read.parquet(dir + "/df"))
      assert(!StreamingRetrieval.foldBatch(spark, b1, 1L, dir)) // replay
      assert(sortedRows(spark.read.parquet(dir + "/df")) == dfBefore)
      assert(ranksFromDisk(dir) == before)
      assert(before == rebuiltRanks)
    }
  }

  test("interrupted fold (slices written, df generation not published) " +
    "replays to the correct state") {
    withDir { dir =>
      assert(StreamingRetrieval.foldBatch(spark, corpus.filter(col("doc_id") < 5), 0L, dir))
      // simulate the crash window: batch 1 wrote its slices but died
      // before the df publish — replay must redo the merge, not skip
      val b1 = corpus.filter(col("doc_id") >= 5)
      RetrievalOps.bm25BuildIndex(b1).postings.write.mode("overwrite")
        .parquet(dir + "/postings/slice_1")
      RetrievalOps.bm25BuildIndex(b1).doclens.write.mode("overwrite")
        .parquet(dir + "/doclens/slice_1")
      assert(StreamingRetrieval.foldBatch(spark, b1, 1L, dir))
      assert(ranksFromDisk(dir) == rebuiltRanks)
    }
  }

  test("batch-0 crash between staging rename and publish: replay skips " +
    "the merge (marker travels with the data), df not double-counted") {
    withDir { dir =>
      // Construct the round-14 review window by hand: slices written,
      // df__next COMPLETE and CARRYING its marker (the new staging
      // protocol guarantees marker+data are never separated), live df
      // missing. recover() must promote the marked generation and the
      // replay must then SKIP — the old protocol (marker added after
      // the parquet write) double-counted batch 0 here.
      val b0 = corpus.filter(col("doc_id") < 5)
      val delta = RetrievalOps.bm25BuildIndex(b0)
      delta.postings.write.mode("overwrite").parquet(dir + "/postings/slice_0")
      delta.doclens.write.mode("overwrite").parquet(dir + "/doclens/slice_0")
      delta.df.write.mode("overwrite").parquet(dir + "/df__next")
      java.nio.file.Files.createFile(
        java.nio.file.Paths.get(dir + "/df__next", "_applied_batch_0"))
      assert(!StreamingRetrieval.foldBatch(spark, b0, 0L, dir)) // replay skips
      val expected = sortedRows(RetrievalOps.bm25RanksFromIndex(
        RetrievalOps.bm25BuildIndex(b0),
        RetrievalOps.queryTerms(corpus, col("doc_id") < 3), k = 5))
      assert(ranksFromDisk(dir) == expected)
    }
  }

  test("stale staging dir from a crash before the rename is swept; " +
    "replay redoes the merge exactly once") {
    withDir { dir =>
      val b0 = corpus.filter(col("doc_id") < 5)
      val delta = RetrievalOps.bm25BuildIndex(b0)
      delta.postings.write.mode("overwrite").parquet(dir + "/postings/slice_0")
      delta.doclens.write.mode("overwrite").parquet(dir + "/doclens/slice_0")
      // crash after the staging write, BEFORE the rename: stage is
      // complete (parquet + marker) but was never promoted
      delta.df.write.mode("overwrite").parquet(dir + "/df__stage")
      java.nio.file.Files.createFile(
        java.nio.file.Paths.get(dir + "/df__stage", "_applied_batch_0"))
      assert(StreamingRetrieval.foldBatch(spark, b0, 0L, dir)) // replay merges
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir + "/df__stage")))
      val expected = sortedRows(RetrievalOps.bm25RanksFromIndex(
        RetrievalOps.bm25BuildIndex(b0),
        RetrievalOps.queryTerms(corpus, col("doc_id") < 3), k = 5))
      assert(ranksFromDisk(dir) == expected)
    }
  }

  test("compaction crash mid-publish (postings retired, swap not done) " +
    "is repaired by the next read") {
    withDir { dir =>
      (0 until 3).foreach { i =>
        assert(StreamingRetrieval.foldBatch(spark,
          corpus.filter(col("doc_id") % 3 === i), i.toLong, dir))
      }
      val before = ranksFromDisk(dir)
      // simulate: compaction wrote a complete postings__next, then died
      // between retiring live and swapping next in
      spark.read.option("recursiveFileLookup", "true")
        .parquet(dir + "/postings").repartition(2)
        .write.mode("overwrite").parquet(dir + "/postings__next")
      java.nio.file.Files.move(
        java.nio.file.Paths.get(dir + "/postings"),
        java.nio.file.Paths.get(dir + "/postings__old"))
      assert(ranksFromDisk(dir) == before)       // readStreamedIndex repairs
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir + "/postings")))
      // and a compaction arriving on a broken predecessor also repairs
      java.nio.file.Files.move(
        java.nio.file.Paths.get(dir + "/doclens"),
        java.nio.file.Paths.get(dir + "/doclens__old"))
      val (_, nAfter) = StreamingRetrieval.compactBm25Index(spark, dir, 2)
      assert(nAfter <= 2)
      assert(ranksFromDisk(dir) == before)
    }
  }

  test("compaction bounds the file count and leaves ranks unchanged") {
    withDir { dir =>
      (0 until 5).foreach { i =>
        assert(StreamingRetrieval.foldBatch(spark,
          corpus.filter(col("doc_id") % 5 === i), i.toLong, dir))
      }
      val before = ranksFromDisk(dir)
      val (nBefore, nAfter) = StreamingRetrieval.compactBm25Index(spark, dir, 2)
      assert(nBefore > nAfter && nAfter <= 2)
      assert(ranksFromDisk(dir) == before)
      assert(before == rebuiltRanks)
    }
  }

  test("serving twin: per-micro-batch BM25 top-k against the frozen index " +
    "== the batch path, external and corpus-member queries alike") {
    withDir { dir =>
      // index the full corpus, then serve two query micro-batches:
      // batch 0 = corpus members 0..2 (must equal the inline audit),
      // batch 1 = an EXTERNAL query (id outside the corpus)
      (0 until 2).foreach { i =>
        assert(StreamingRetrieval.foldBatch(spark,
          corpus.filter(col("doc_id") % 2 === i), i.toLong, dir))
      }
      implicit val sq = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val served = collection.mutable.Map.empty[Long, Seq[String]]
      val query = StreamingRetrieval.bm25ServeStream(spark,
          input.toDF().toDF("doc_id", "text"), dir) { (ranked, batchId) =>
        served(batchId) = sortedRows(ranked)
      }.option("checkpointLocation", dir + "/serve_ckpt").start()
      try {
        input.addData(corpus.filter(col("doc_id") < 3)
          .as[(Long, String)].collect().toSeq: _*)
        query.processAllAvailable()
        input.addData((1000L, "apple banana zebra"))
        query.processAllAvailable()
      } finally query.stop()
      // corpus-member batch: identical to the inline batch audit
      assert(served(0L) == rebuiltRanks)
      // external batch: equals the batch-path scoring of the same terms
      val extTerms = Seq((1000L, "apple"), (1000L, "banana"), (1000L, "zebra"))
        .toDF("q_id", "word")
      assert(served(1L) == sortedRows(RetrievalOps.bm25RanksFromIndex(
        StreamingRetrieval.readStreamedIndex(spark, dir), extTerms, k = 5)))
      assert(served(1L).nonEmpty)
    }
  }

  test("hybrid serving twin: per-batch RRF fusion over both frozen indexes " +
    "== the batch fusion of the same channels") {
    import graft.ops.PqOps
    withDir { dir =>
      (0 until 2).foreach { i =>
        assert(StreamingRetrieval.foldBatch(spark,
          corpus.filter(col("doc_id") % 2 === i), i.toLong, dir))
      }
      val vecs = RetrievalOps.denseDocEmbeddings(corpus)
      val cb = PqOps.trainCodebook(vecs)
      val annIdx = PqOps.annIndex(vecs, cb)
      val expected = sortedRows(RetrievalOps.rrfFuse(
        RetrievalOps.bm25Ranks(corpus, col("doc_id") < 2, 10),
        RetrievalOps.denseRanksAnnIndex(corpus, col("doc_id") < 2, 10,
          prebuilt = Some((annIdx, cb)))
          .select(col("q_id"), col("doc_id"), col("rank")), k = 5))
      implicit val sq = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val served = collection.mutable.Map.empty[Long, Seq[String]]
      val query = StreamingRetrieval.hybridServeStream(spark,
          input.toDF().toDF("doc_id", "text"), dir, annIdx, cb) {
        (fused, batchId) => served(batchId) = sortedRows(fused)
      }.option("checkpointLocation", dir + "/hserve_ckpt").start()
      try {
        input.addData(corpus.filter(col("doc_id") < 2)
          .as[(Long, String)].collect().toSeq: _*)
        query.processAllAvailable()
      } finally query.stop()
      assert(served(0L) == expected && served(0L).nonEmpty)
    }
  }
}
