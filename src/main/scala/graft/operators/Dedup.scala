package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Last-writer-wins deduplication — the semantic heart of the silver layer
  * (≡ reference W1+P3, scripts/bronze-silver.py:258-266:
  * `ROW_NUMBER() OVER (PARTITION BY invoiceid ORDER BY processed_time DESC)
  * … WHERE row_num = 1`).
  *
  * One shuffle on the key, sort within partitions, no driver involvement.
  * At 100 TB this is the canonical hash-partitioned window; skewed keys
  * would be handled upstream (a CDC key is near-unique by construction, so
  * the per-key group is tiny and skew is structurally impossible here).
  */
object Dedup {

  /** Keep the single latest row per key, ordered by `orderBy` columns
    * descending (pass explicit tie-breakers for determinism). */
  def latestPerKey(df: DataFrame, keys: Seq[String],
      orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderBy.map(_.desc): _*)
    df.withColumn("__graft_rn", row_number().over(w))
      .where(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }

  def latestPerKey(df: DataFrame, key: String, orderCol: String,
      tieBreakers: String*): DataFrame =
    latestPerKey(df, Seq(key), (orderCol +: tieBreakers).map(col))
}
