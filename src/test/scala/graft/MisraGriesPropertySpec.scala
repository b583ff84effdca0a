package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

import graft.functions.MisraGries.misraGries

/** Property-level correctness for the Misra-Gries aggregate: the
  * registered queries' DuckDB oracles check the VERIFIED exact top-k,
  * so a sketch whose bounds silently weakened (e.g. a prune that
  * removes too much mass) could hide behind a candidate set that
  * happens to stay big enough on the fixture corpus. These properties
  * pin the sketch's mathematical contract directly on generated
  * streams: for RANDOM streams, capacities, and partitionings —
  *
  *  - every reported count_lb is a true lower bound;
  *  - undercount ≤ N/(m+1) for every retained item;
  *  - every item with true count > N/(m+1) is retained (superset);
  *  - the summary never exceeds 2m entries.
  */
class MisraGriesPropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = Parameters.default.withMinSuccessfulTests(8)

  test("MG sketch bounds hold on random Zipf-ish streams (property)") {
    val gen = for {
      capacity <- Gen.choose(2, 64)
      nKeys <- Gen.choose(5, 400)
      reps <- Gen.choose(1, 30)
      parts <- Gen.choose(1, 13)
      seed <- Gen.choose(0L, Long.MaxValue)
    } yield (capacity, nKeys, reps, parts, seed)

    val prop = Prop.forAll(gen) { case (capacity, nKeys, reps, parts, seed) =>
      val rnd = new scala.util.Random(seed)
      // Zipf-ish: key i drawn with weight ~ 1/(i+1), plus a deterministic
      // hot head so heavy items exist at every capacity
      val stream = (0 until nKeys).flatMap { i =>
        Seq.fill(1 + (reps * nKeys) / ((i + 1) * (i + 1)))(s"k$i")
      } ++ Seq.fill(reps)("k0")
      val shuffled = rnd.shuffle(stream)
      val n = shuffled.size.toLong
      val truth = shuffled.groupBy(identity).view.mapValues(_.size.toLong).toMap

      val got = shuffled.toDF("tok").repartition(parts)
        .agg(misraGries(col("tok"), capacity).as("s"))
        .select(explode(col("s")).as("c"))
        .select($"c.item", $"c.count_lb").as[(String, Long)]
        .collect().toMap

      val bound = n / (capacity + 1)
      val sizeOk = got.size <= 2 * capacity
      val lowerOk = got.forall { case (k, lb) => lb >= 1 && lb <= truth(k) }
      val underOk = got.forall { case (k, lb) => truth(k) - lb <= bound }
      val supersetOk = truth.forall { case (k, c) => c <= bound || got.contains(k) }
      sizeOk && lowerOk && underOk && supersetOk
    }
    val r = check(params, prop)
    assert(r.passed, r.status.toString)
  }

  test("serialize/deserialize round-trips the buffer exactly") {
    val agg = graft.functions.MisraGriesAgg(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), 8)
    val buf = agg.createAggregationBuffer()
    val keys = Seq("a", "βγ", "", "long-token-with-utf8-✓", "z")
    keys.zipWithIndex.foreach { case (k, i) =>
      buf.update(org.apache.spark.unsafe.types.UTF8String.fromString(k),
        (i + 1).toLong)
    }
    val back = agg.deserialize(agg.serialize(buf))
    assert(back == buf)
  }

  test("capacity < 1 is rejected loudly") {
    intercept[IllegalArgumentException] {
      graft.functions.MisraGriesAgg(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), 0)
    }
  }
}
