package graft

import graft.ops.TextOps
import org.apache.spark.sql.functions.col

/** SURVEY.md §5.2 edge cases for the tokenizers + text analysis. */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("F6 regex tokenize lowercases and drops the empty leading token") {
    // A line starting with punctuation makes \W+ split yield "" first
    // (kstreams/App.java:134's corpus starts lines with quotes).
    val df = Seq("\"To Be, or not to be!").toDF("text")
    val words = TextOps.tokenizeRegex(df, col("text")).as[String].collect().toSeq
    assert(words == Seq("to", "be", "or", "not", "to", "be"))
  }

  test("F7 space tokenize keeps case and punctuation, splits single spaces") {
    val df = Seq("To Be,  or").toDF("text")
    val words = TextOps.tokenizeSpace(df, col("text")).as[String].collect().toSeq
    // double space yields an empty token — reference semantics (split(" "))
    assert(words == Seq("To", "Be,", "", "or"))
  }

  test("F6 and F7 disagree on the same corpus (distinct operators)") {
    val df = Seq("Hello, hello World").toDF("text")
    val regex = TextOps.wordCount(TextOps.tokenizeRegex(df, col("text")))
      .as[(String, Long)].collect().toMap
    val space = TextOps.wordCount(TextOps.tokenizeSpace(df, col("text")))
      .as[(String, Long)].collect().toMap
    assert(regex("hello") == 2)         // case-folded
    assert(space.get("hello") == Some(1) && space.get("Hello,") == Some(1))
  }

  test("word count total equals token count (invariant)") {
    val df = Seq("a b c", "a b", "x").toDF("text")
    val words = TextOps.tokenizeSpace(df, col("text"))
    val total = TextOps.wordCount(words).agg(org.apache.spark.sql.functions.sum("cnt"))
      .as[Long].head()
    assert(total == words.count())
  }

  test("textStats: counts, ratio, and quality on a known doc") {
    val df = Seq((1L, "the cat sat")).toDF("doc_id", "text")
    val r = TextOps.textStats(df).collect().head
    assert(r.getAs[Long]("n_tokens") == 3)
    assert(r.getAs[Long]("n_chars") == 11)
    assert(r.getAs[Long]("n_stop") == 1)           // "the"
    assert(r.getAs[Double]("avg_token_len") == 3.0) // (11-2)/3
    assert(math.abs(r.getAs[Double]("stop_ratio") - 1.0 / 3) < 1e-15)
  }

  test("language ID is deterministic and predicts the dominant profile") {
    val docs = Seq(
      (0L, "en", "hello world hello"),   // training (even id)
      (2L, "fr", "bonjour monde"),       // training
      (1L, "??", "hello world"),         // test (odd id) → en
      (3L, "??", "bonjour bonjour")      // test → fr
    ).toDF("doc_id", "lang", "text")
    val pred = TextOps.languageId(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
    assert(pred == Map(1L -> "en", 3L -> "fr"))
  }
}
