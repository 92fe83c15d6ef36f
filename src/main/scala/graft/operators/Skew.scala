package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed.
  *
  * AQE's skew-join split (spark.sql.adaptive.skewJoin) handles most cases
  * at runtime; explicit salting remains the tool when one side must be a
  * shuffle join AND the hot keys are known or unbounded (e.g. a power-law
  * user_id). The big side gets a uniform random-ish salt derived from a
  * stable row expression (no rand() — deterministic, retry-safe); the
  * small side is replicated once per salt value. Join key becomes
  * (key, salt), spreading each hot key over `salts` reducers.
  *
  * Cost model: small side inflates by `salts`x (it shuffles or broadcasts
  * that many copies); choose salts ~ (hot-key rows / target rows per
  * partition). Correctness is identical to the unsalted join for
  * inner/left joins on equi-keys, which a spec pins.
  */
object Skew {

  /** Deterministic salt in [0, salts): hash of a stable discriminator
    * column (e.g. a unique id) — NOT rand(), so task retries and AQE
    * re-execution see the same assignment.
    */
  def saltCol(discriminator: Column, salts: Int): Column =
    pmod(xxhash64(discriminator), lit(salts)).cast("int")

  /** Inner/left equi-join of a skewed big side against a small side,
    * salted `salts` ways. `bigDiscriminator` must be stable per big-side
    * row (a primary key works).
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame, key: String,
      bigDiscriminator: Column, salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    // replication of the small side is only correct when unmatched
    // small-side rows never surface: right/full joins would emit each
    // unmatched small row once PER SALT
    require(Set("inner", "left", "left_outer", "leftouter").contains(joinType),
      s"saltedJoin supports inner/left joins only, got '$joinType'")
    val saltedBig = big.withColumn("__salt", saltCol(bigDiscriminator, salts))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
