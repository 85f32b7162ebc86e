package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted-key repartitioner for hot-key skew (SURVEY.md §4; the reference
  * has no skew handling at all and "would melt on a hot district").
  *
  * Two distinct skew surfaces in this engine:
  *
  * 1. The APPLY path needs no salting: latest-per-key dedup runs as either
  *    a hash aggregate (map-side partial combine shrinks a hot key on every
  *    input partition before the shuffle) or a bucket-aligned window (the
  *    hot key must land in its bucket anyway — that's the output contract).
  *
  * 2. PUBLISH-layer aggregations grouped by a coarser key (repo, lang, …)
  *    DO skew: one hot repo can carry 50% of all rows (FIXTURES.md §4).
  *    `saltedAgg` splits each group into `salts` subgroups for the first
  *    (heavy) shuffle, then combines the partial aggregates in a second,
  *    tiny shuffle — classic two-phase salted aggregation. Correct for any
  *    commutative-associative aggregate.
  */
object Salting {

  /** deterministic per-row salt in [0, salts) — xxhash on a fine-grained
    * column so the hot group's rows spread evenly.
    */
  def saltCol(fine: Column, salts: Int): Column =
    pmod(xxhash64(fine), lit(salts.toLong)).cast("int")

  /** spread rows of hot groups across `salts` pseudo-partitions */
  def spread(df: DataFrame, fine: Column, salts: Int): DataFrame =
    df.withColumn("__salt", saltCol(fine, salts))

  /** Two-phase salted aggregation:
    * groupBy(key, salt).agg(partials)  — heavy shuffle, skew split S ways
    * groupBy(key).agg(combine)         — tiny shuffle over S×|keys| rows
    *
    * `partial`: (inputCol alias → partial agg expr);
    * `combine`: how to merge the partials (keyed by the SAME aliases).
    */
  def saltedAgg(df: DataFrame, key: Seq[Column], fine: Column, salts: Int,
                partial: Seq[Column], combine: Seq[Column]): DataFrame =
    spread(df, fine, salts)
      .groupBy(key :+ col("__salt"): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(key: _*)
      .agg(combine.head, combine.tail: _*)

  /** salted count per group — the common case packaged */
  def saltedCount(df: DataFrame, key: Seq[Column], fine: Column, salts: Int = 16,
                  alias: String = "n"): DataFrame =
    saltedAgg(df, key, fine, salts,
      partial = Seq(count(lit(1)).as("__c")),
      combine = Seq(sum("__c").as(alias)))
}
