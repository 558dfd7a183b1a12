package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew- and shuffle-management utilities (SURVEY.md §4).
  *
  * AQE's runtime skew-join split handles moderate skew; these are the
  * plan-level tools for the pathological cases a 100 TB pipeline
  * actually hits — one key holding a double-digit percentage of the
  * fact table, where any single-partition strategy fails regardless
  * of partition sizing.
  */
object Skew {

  /** Equi-join `fact ⋈ other` on `key` with the fact side's hot keys
    * scattered across `salt` sub-partitions.
    *
    * The fact side gets a deterministic pseudo-random salt per row;
    * the other side is replicated `salt` times (so every fact
    * sub-partition finds its match). The shuffle key becomes
    * (key, salt): a key that held p% of the rows now holds p/salt per
    * task. Use when the other side is too big to broadcast but small
    * enough that `salt`-fold replication is cheap — the classic
    * skewed-fact / mid-size-dim shape.
    */
  def saltedJoin(fact: DataFrame, other: DataFrame, key: String,
      salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt > 1, "salt must be > 1")
    // right/full joins would see `other` rows salt times
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left joins, not $joinType")
    // xxhash64 over the whole row scatters duplicates of the hot key
    // uniformly; monotonically_increasing_id breaks ties between
    // fully identical rows.
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.map(col).toIndexedSeq: _*),
        monotonically_increasing_id()), lit(salt)))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt - 1L))))
    saltedFact.join(replicated,
      saltedFact(key) === replicated(key) &&
        saltedFact("__salt") === replicated("__salt"), joinType)
      .drop(replicated(key)).drop("__salt")
  }
}
