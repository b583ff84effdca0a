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
}
