package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join: the big side's hot keys are spread over
  * `salts` sub-keys and the small(er) side is replicated once per salt, so
  * one hot key occupies `salts` shuffle partitions instead of one straggler
  * task. The complement of `Aggregates.saltedAgg` (salted GROUP BY).
  *
  * The salt value never reaches the output and does not change join
  * semantics — only WHERE each pair meets — which is why the result is
  * oracle-checkable against a plain join. Use when a broadcast is too big
  * and AQE's skew splitting can't help (e.g. the skew is in a single key
  * within one partition of a bucketed table). Cost: small side × salts
  * replication — keep salts at ~(hot-key rows / average-key rows).
  */
object SaltedJoin {

  def apply(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    // deterministic salt from the row content (any spread works; hash of
    // the key column would NOT — every copy of a hot key must scatter)
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(salts.toLong)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
