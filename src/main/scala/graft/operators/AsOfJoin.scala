package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for every left row, attach the latest right row
  * of the same key with `right.ts <= left.ts` — the standard way to join
  * events to the dimension/state that was current when they happened.
  *
  * Implemented with the union-sort trick rather than a custom join
  * operator (the brief's preference order — compose built-ins first):
  * tag and union both sides, one shuffle on the key, sort by (ts, side)
  * within each key partition, and carry the last non-null right payload
  * forward with `last_value(ignoreNulls)` over an unbounded-preceding
  * frame. A right row at the same timestamp sorts before the left row,
  * so the match is inclusive.
  *
  * Cost at scale: ONE hash shuffle of |L|+|R| rows + an in-partition
  * sort — strictly cheaper than the range-join expansion (|L|·|R| per
  * key) a naive `l.ts >= r.ts` join condition would produce, and the
  * same shape Spark's own SQL `ASOF`-less engines use. Key skew behaves
  * like any window: one hot key = one hot partition → pre-salt hot keys
  * with [[SaltedJoin]] if a key carries a double-digit percentage of
  * rows.
  */
object AsOfJoin {

  /** @param left       probe side (keeps all rows; left-outer semantics)
    * @param right      reference side whose latest-at-or-before row wins
    * @param keys       equality keys present on both sides
    * @param leftTs     left event-time column (same unit as rightTs)
    * @param rightTs    right event-time column
    * @param rightCols  right payload columns to attach, each emitted as
    *                   `asof_<name>` (null when no right row precedes)
    * @param tolerance  max lookback `leftTs - rightTs` (same unit as the
    *                   ts columns, ≡ pandas merge_asof tolerance): a
    *                   match older than this yields nulls. None = any
    *                   age. Applied AFTER the carry-forward, so it adds
    *                   zero shuffles — just a codegen'd filter on the
    *                   attached payload's timestamp.
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      rightCols: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {
    val ts = "__asof_ts"
    val side = "__asof_side" // 0 = right, 1 = left: right sorts first on ties
    val payload = "__asof_payload"
    val tolTs = "__asof_tol_ts" // right ts carried for the tolerance check

    val leftCols = left.columns.toSeq
    val l = left
      .withColumn(ts, col(leftTs))
      .withColumn(side, lit(1))
      .withColumn(payload,
        lit(null).cast(org.apache.spark.sql.types.StructType(
          right.select(rightCols.map(col) :+ col(rightTs).as(tolTs): _*)
            .schema.fields)))
    val r = right
      .select((keys.map(col) :+ col(rightTs).as(ts)) :+
        struct(rightCols.map(col) :+ col(rightTs).as(tolTs): _*)
          .as(payload): _*)
      .withColumn(side, lit(0))
    // align columns for the union: right side lacks the left payload
    val rAligned = leftCols.foldLeft(r) { (df, c) =>
      if (keys.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l.columns.map(col).toIndexedSeq: _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts), col(side))
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = l.unionByName(rAligned)
      .withColumn(payload, last(col(payload), ignoreNulls = true).over(w))
      .where(col(side) === 1)
    def attached(c: String): Column = tolerance match {
      case Some(tol) =>
        when(col(ts) - col(s"$payload.$tolTs") <= tol, col(s"$payload.$c"))
      case None => col(s"$payload.$c")
    }
    matched.select(leftCols.map(col) ++
      rightCols.map(c => attached(c).as(s"asof_$c")): _*)
  }
}

/** Manual skew mitigation for joins AQE can't rebalance (e.g. a broadcast
  * isn't possible and one key dominates): salt the skewed (large) side
  * into `saltFactor` sub-keys and explode the other side across all
  * salts. Standard salting — trades `saltFactor`× duplication of the
  * small side for even partition sizes on the large side.
  *
  * KNOWN LIMITATION of the default (content-hash) salt: BYTE-IDENTICAL
  * duplicate rows all hash to the same salt, so a hot key made of exact
  * duplicates — the common skew shape in raw event/log feeds — still
  * lands on one reducer. Pass `spreadDuplicates = true` to mix the
  * source split (`input_file_name`, `spark_partition_id`) into the salt:
  * duplicates from different files/input partitions then spread across
  * reducers. The mixed salt is stable under a plain task RETRY (a
  * re-executed task re-reads the same file split, so every row gets the
  * same salt again) but NOT under an upstream repartition whose
  * row-to-partition routing is itself nondeterministic — keep the
  * default for such inputs.
  */
object SaltedJoin {

  /** The skewed-side salt column. Default: deterministic content hash of
    * the full row (never monotonically_increasing_id — a retried map
    * task re-salting rows differently than its first attempt would route
    * them to different reducers and duplicate/lose join rows). Hashing
    * ALL columns (not just the keys) splits a hot key across reducers
    * whenever its rows differ anywhere; `spreadDuplicates` additionally
    * mixes in the row's source split for the all-duplicates case. */
  private[operators] def saltExpr(skewed: DataFrame, saltFactor: Int,
      spreadDuplicates: Boolean): org.apache.spark.sql.Column = {
    val content = xxhash64(skewed.columns.map(col).toIndexedSeq: _*)
    val h =
      if (spreadDuplicates)
        xxhash64(content, input_file_name(), spark_partition_id())
      else content
    pmod(h, lit(saltFactor)).cast("int")
  }

  def join(skewed: DataFrame, other: DataFrame, keys: Seq[String],
      saltFactor: Int, joinType: String = "inner",
      spreadDuplicates: Boolean = false): DataFrame = {
    require(saltFactor > 1, "saltFactor must be > 1")
    val salt = "__salt"
    val s = skewed.withColumn(salt,
      saltExpr(skewed, saltFactor, spreadDuplicates))
    val o = other.withColumn(salt,
      explode(sequence(lit(0), lit(saltFactor - 1))))
    s.join(o, keys :+ salt, joinType).drop(salt)
  }
}
