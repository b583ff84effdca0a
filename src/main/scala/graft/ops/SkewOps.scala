package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §4.2 / the 100 TB checklist): salting for
  * joins whose key distribution is hot. AQE's skew-join handles sort-merge
  * skew adaptively at runtime; explicit salting is the deterministic
  * planner-level tool when the hot keys are known or AQE can't kick in
  * (e.g. shuffle-hash joins, streaming joins).
  *
  * Mechanics: the dim side is replicated `salts`× (one copy per salt
  * value); the fact side assigns each ROW a salt from row-level entropy —
  * never from the join key alone, which would keep the hot key on one
  * reducer. The join key becomes (key, salt), spreading a hot key over
  * `salts` reducers. Result set is IDENTICAL to the unsalted join, so the
  * DuckDB oracle is the plain join.
  */
object SkewOps {

  /** Inner equi-join of fact⋈dim on `key`, salted `salts` ways.
    * `saltSource` must be a fact-side column (or expression) with
    * row-level entropy, e.g. an id column — `pmod(hash(saltSource), salts)`
    * spreads each hot key's rows uniformly.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltSource: Column, salts: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(saltSource), lit(salts)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim.hint("shuffle_hash"), Seq(key, "__salt"))
      .drop("__salt")
  }
}
