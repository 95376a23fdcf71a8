package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SURVEY.md §4 / north-star scale notes).
  *
  * AQE's skew-join splitting handles most cases at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default with AQE); these
  * helpers cover the two patterns AQE can't fix:
  *
  *  - [[saltedAggregate]] — a groupBy where one key holds a large share of
  *    all rows: partial-aggregate over (key, salt) first, then merge the
  *    salt groups. Two small shuffles instead of one hot partition.
  *  - [[saltedJoin]] — a join whose build side must be replicated across
  *    the salts of a skewed probe side (broadcast is better when the build
  *    side fits; this is for when it doesn't).
  */
object Skew {

  /** Two-phase aggregation over a skewed key. `partialAggs` run per
    * (key, salt); `mergeAggs` combine the partials per key. Example:
    * count → partial count(*) + merge sum(partial).
    */
  def saltedAggregate(
      df: DataFrame,
      keyCol: String,
      salts: Int,
      partialAggs: Seq[Column],
      mergeAggs: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val partial = salted.groupBy(col(keyCol), col("__salt")).agg(partialAggs.head, partialAggs.tail: _*)
    partial.groupBy(col(keyCol)).agg(mergeAggs.head, mergeAggs.tail: _*)
  }

  /** Salted equi-join: the skewed (large) side gets a random salt in
    * [0, salts); the small side is replicated once per salt value. The join
    * key becomes (key, salt), spreading each hot key over `salts` tasks.
    */
  def saltedJoin(
      skewed: DataFrame,
      other: DataFrame,
      keyCol: String,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    val saltedBig = skewed.withColumn(
      "__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val replicated = other.withColumn("__salt", explode(sequence(lit(0L), lit(salts - 1L))))
    saltedBig.join(replicated, Seq(keyCol, "__salt"), joinType).drop("__salt")
  }
}
