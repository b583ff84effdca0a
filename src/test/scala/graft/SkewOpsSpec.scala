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
