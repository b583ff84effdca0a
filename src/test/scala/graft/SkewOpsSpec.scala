package graft

import graft.ops.SkewOps
import org.apache.spark.sql.functions._

class SkewOpsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join result set") {
    val fact = (1L to 100L).map(i => (i, if (i <= 90) "hot" else s"k$i"))
      .toDF("id", "key")  // 90% of rows on one key — the skew shape
    val dim = Seq(("hot", 1L), ("k91", 2L), ("k95", 3L)).toDF("key", "v")
    val salted = SkewOps.saltedJoin(fact, dim, "key", col("id"), salts = 8)
      .select("id", "key", "v").as[(Long, String, Long)].collect().sorted.toSeq
    val plain = fact.join(dim, "key").select("id", "key", "v")
      .as[(Long, String, Long)].collect().sorted.toSeq
    assert(salted == plain)
    assert(salted.count(_._2 == "hot") == 90)
  }

  test("fact rows of one hot key spread across salt values") {
    val fact = (1L to 64L).map(i => (i, "hot")).toDF("id", "key")
    val salts = fact.withColumn("__salt", pmod(hash(col("id")), lit(8)))
      .select("__salt").as[Int].collect().toSet
    assert(salts.size > 4)  // entropy actually spreads the key
  }
}

class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("HLL approx distinct is within rsd of exact") {
    val events = (1L to 5000L).map(i => (i % 7 match {
      case 0 => "a"; case 1 => "b"; case _ => "c"
    }, i % 400)).toDF("event_type", "user_id")
    val out = graft.ops.EventOps.approxUsersByType(events, rsd = 0.02).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("approx_users")).toMap
    val exact = events.groupBy("event_type")
      .agg(org.apache.spark.sql.functions.countDistinct("user_id").as("n")).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n")).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(out(k) - n).toDouble / n < 0.1, s"$k: ${out(k)} vs $n")
    }
  }
}
