package graft

import graft.ops.{EventOps, RelationalOps}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

/** Property-based invariants for the round-3 operators — algebraic laws
  * that must hold for ANY input, not just the oracle corpus.
  */
class Round3PropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = Parameters.default.withMinSuccessfulTests(8)

  test("sliding windows cover every event exactly width/slide times (property)") {
    val evGen = for {
      ts <- Gen.chooseNum(1700000000000000L, 1710000000000000L) // micros
      tpe <- Gen.oneOf("a", "b", "c")
    } yield (ts, tpe)
    val prop = Prop.forAll(Gen.nonEmptyListOf(evGen)) { evs =>
      val df = evs.zipWithIndex
        .map { case ((us, t), i) => (i.toLong, us * 1000, t, "{}") }
        .toDF("event_id", "ts", "event_type", "props")
      val total = EventOps.slidingCounts(df)
        .agg(sum("n_events")).as[Long].head()
      total == 2L * evs.length
    }
    val r = check(params, prop); assert(r.passed, r.status.toString)
  }

  test("rollup levels are consistent: subtotals sum to the grand total (property)") {
    val rowGen = for {
      f <- Gen.oneOf("A", "N", "R"); s <- Gen.oneOf("F", "O")
      q <- Gen.chooseNum(1, 50)
    } yield (f, s, q.toDouble)
    val prop = Prop.forAll(Gen.nonEmptyListOf(rowGen)) { rows =>
      val df = rows.toDF("l_returnflag", "l_linestatus", "l_quantity")
      val out = RelationalOps.pricingRollup(df)
        .select("n_items", "sum_qty", "lvl").as[(Long, Double, Long)].collect()
      val byLvl = out.groupBy(_._3)
      val grand = byLvl(3L).head
      def totals(lvl: Long) =
        (byLvl(lvl).map(_._1).sum, byLvl(lvl).map(_._2).sum)
      totals(0L) == ((grand._1, grand._2)) && totals(1L) == ((grand._1, grand._2))
    }
    val r = check(params, prop); assert(r.passed, r.status.toString)
  }

  test("running total's last row per customer equals the group sum (property)") {
    val rowGen = for {
      cust <- Gen.chooseNum(1L, 5L)
      day <- Gen.chooseNum(0, 300)
      price <- Gen.chooseNum(1, 500000)
    } yield (cust, day, price.toDouble)
    val prop = Prop.forAll(Gen.nonEmptyListOf(rowGen)) { rows =>
      val df = rows.zipWithIndex.map { case ((c, d, p), i) =>
        (i.toLong, c, java.sql.Timestamp.valueOf(java.time.LocalDate.of(1995, 1, 1)
          .plusDays(d).atStartOfDay()), p)
      }.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      val rt = RelationalOps.runningTotals(df)
      val lastPerCust = rt
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("o_custkey")
            .orderBy(col("order_seq").desc)))
        .filter(col("rn") === 1)
        .select("o_custkey", "running_spend").as[(Long, Double)].collect().toMap
      val expect = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      lastPerCust == expect
    }
    val r = check(params, prop); assert(r.passed, r.status.toString)
  }
}
