package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-hardening join shapes. AQE's skew-join split handles most hot
 * keys by splitting oversized SHUFFLE partitions, but it cannot help
 * when the hot key must land in one task by semantics (e.g. a
 * broadcast is impossible and one key carries 10% of a 100 TB fact
 * table). Salting is the explicit form: spread each fact key over
 * `salt` sub-keys, replicate the dimension row once per sub-key, and
 * the hot key's work lands on `salt` tasks instead of one.
 */
object JoinOps {

  /**
   * Salted inner equi join: `facts ⋈ dims` on `key`, with the fact
   * side spread over `salt` sub-partitions by `spread` (any
   * fact-side column that varies within a key — an id, a timestamp)
   * and the dim side replicated `salt`×. Row-for-row identical to the
   * plain inner join — each fact row matches exactly the one dim
   * replica carrying its salt — while the shuffle key becomes
   * (key, salt), so no single reducer owns a hot key.
   *
   * Cost: dims scan out `salt`× rows (dims are the small side by
   * contract — that's why they couldn't just be broadcast only when
   * they're NOT: this operator is for the middle ground where dims
   * exceed the broadcast budget but one fact key floods a task).
   */
  def saltedJoin(facts: DataFrame, dims: DataFrame, key: String,
                 spread: Column, salt: Int): DataFrame = {
    require(salt >= 1 && salt <= 4096, s"salt in [1,4096], got $salt")
    // the salt column is internal scaffolding: withColumn would
    // silently REPLACE a caller's same-named column and the final drop
    // would then delete user data — fail loudly instead
    for ((side, df) <- Seq("facts" -> facts, "dims" -> dims))
      require(!df.columns.contains("_salt"),
        s"saltedJoin: $side input already has a `_salt` column — rename it; " +
          "the name is reserved as the internal salting key")
    val sf = facts.withColumn("_salt",
      pmod(xxhash64(spread), lit(salt.toLong)).cast("int"))
    val sd = dims.withColumn("_salt",
      explode(array((0 until salt).map(i => lit(i)): _*)))
    sf.join(sd, Seq(key, "_salt")).drop("_salt")
  }
}
