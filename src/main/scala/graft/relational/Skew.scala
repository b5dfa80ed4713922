package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation for equi-joins (SURVEY §4 physical-execution policy).
  *
  * AQE's skew-join split handles most runtime skew; salting is the static
  * fallback when one key dominates so hard that even split partitions of it
  * exceed executor memory (the classic hot-user / hot-null problem at
  * 100 TB). The trade: the small side is replicated `buckets`×, the big
  * side's rows are spread across `buckets` partitions per key.
  *
  * The salt must be DETERMINISTIC (a rand() salt changes results under
  * task retry): it is derived by hashing the caller-provided discriminator
  * columns — any columns that vary within a key group (a line number, an
  * event id; worst case the whole row struct).
  */
object Skew {

  /** Inner equi-join of `big ⋈ small` on `bigKey == smallKey`, salted into
    * `buckets` sub-keys. `discriminator` spreads the big side's rows within
    * each key group. */
  def saltedJoin(big: DataFrame, small: DataFrame,
                 bigKey: Column, smallKey: Column,
                 discriminator: Column, buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "saltedJoin writes a '__salt' working column; input already has one — rename it first")
    val saltedBig = big.withColumn("__salt", pmod(xxhash64(discriminator), lit(buckets)))
    // replicate the small side once per salt bucket — explode of a literal
    // range, no shuffle on this side until the join itself
    val saltedSmall = small.withColumn("__salt",
      explode(array((0 until buckets).map(i => lit(i.toLong)): _*)))
    saltedBig.join(saltedSmall,
        saltedBig("__salt") === saltedSmall("__salt") && bigKey === smallKey)
      .drop("__salt")
  }
}
