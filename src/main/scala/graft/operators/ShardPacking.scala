package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget shard packing: assign documents to training shards so
  * each shard holds ~`budget` weight (token count), preserving a
  * deterministic global order — the "pack the corpus into N-token
  * files" step that precedes tokenizer sharding.
  *
  * `shard = ⌊(running_total − weight) / budget⌋`: a document belongs to
  * the shard its STARTING offset falls in, so every shard's start
  * offsets lie in `[k·budget, (k+1)·budget)` and a shard overflows only
  * by the tail document that straddles the boundary (≤ max weight).
  *
  * Scale shape — the distributed prefix-sum, NOT a global window: a
  * naive `sum() OVER (ORDER BY id)` with no partition key funnels the
  * whole corpus through ONE task. Here rows are range-partitioned by
  * the order column, each partition computes its LOCAL running sum, and
  * the per-partition totals (numPartitions rows, not corpus rows) get a
  * tiny driver-sized window to produce partition offsets that broadcast
  * back. Wide work is all partition-local; the only single-task step
  * touches one row per partition. */
object ShardPacking {

  /** df + `startCol` = each row's EXCLUSIVE global prefix sum of
    * `weightCol` in `orderCol` order — the distributed prefix-sum
    * primitive described above, shared by shard assignment and
    * [[SequencePacking]]. */
  def withStartOffsets(df: DataFrame, weightCol: String, orderCol: String,
      startCol: String, numRangePartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numRangePartitions > 0) numRangePartitions
      else spark.sessionState.conf.numShufflePartitions
    val pid = "__graft_pid"
    val ranged = df
      .repartitionByRange(n, col(orderCol))
      .sortWithinPartitions(orderCol)
      .withColumn(pid, spark_partition_id())
    val localW = Window.partitionBy(pid).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged.withColumn("__cum_local",
      sum(col(weightCol)).over(localW))
    // per-partition totals: n rows — the tiny single-task window here
    // IS the scalable pattern (prefix offsets over partition counts)
    val offsetW = Window.orderBy(pid)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col(pid))
      .agg(sum(col(weightCol)).as("__tot"))
      .withColumn("__offset",
        coalesce(sum(col("__tot")).over(offsetW), lit(0L)))
      .select(col(pid), col("__offset"))
    local.join(broadcast(offsets), Seq(pid))
      .withColumn(startCol,
        col("__cum_local") + col("__offset") - col(weightCol))
      .drop(pid, "__cum_local", "__offset")
  }

  def assign(df: DataFrame, weightCol: String, orderCol: String,
      budget: Long, numRangePartitions: Int = 0): DataFrame = {
    require(budget > 0, "budget must be positive")
    withStartOffsets(df, weightCol, orderCol, "__start",
        numRangePartitions)
      .withColumn("shard",
        floor(col("__start") / lit(budget.toDouble)).cast("long"))
      .drop("__start")
  }
}
