package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Band (range) join: all (left, right) pairs with
  * |leftTs − rightTs| ≤ band — the temporal-correlation join with NO
  * equi key (errors vs deploys, events vs incidents). Vanilla Spark
  * plans a pure inequality join as BroadcastNestedLoopJoin — O(n·m)
  * comparisons and a broadcast of one ENTIRE side — which is exactly
  * the shape that dies first at scale. This operator is the standard
  * binning rewrite (≡ Databricks' range-join optimization): quantize
  * time into `band`-wide bins, explode the SMALLER side to its bin and
  * both neighbors (any pair within `band` differs by at most one bin),
  * equi-join on the bin, then apply the exact predicate.
  *
  * Scale shape: one hash-shuffle join on the bin id instead of a
  * nested loop — each row is compared only against rows within ±1 bin
  * (≈ the rows inside a 3·band time window), so total work is
  * Σ_bin |L_bin|·|R_bin±1|, the output-proportional cost a range join
  * should pay. The 3× fan-out rides the smaller (right) side. A hot
  * bin is an AQE skew-join case like any hot hash key. */
object BandJoin {

  /** Inner band join. `leftTsCol`/`rightTsCol` (distinct names —
    * rename before calling if both sides share one) are NUMERIC event
    * times in the same unit as `band` (e.g. epoch micros). Every
    * qualifying pair appears exactly once: the exploded copies carry
    * distinct bin ids and the equi-join keeps only the copy matching
    * the left row's single bin. */
  def join(left: DataFrame, right: DataFrame, leftTsCol: String,
      rightTsCol: String, band: Long): DataFrame = {
    require(band > 0, s"band must be positive, got $band")
    require(leftTsCol != rightTsCol,
      "time columns must have distinct names (rename one side)")
    val leftTs = col(leftTsCol)
    val rightTs = col(rightTsCol)
    // floor division keeps negative timestamps correct; floor over
    // double is exact for |ts| < 2^53 (epoch-µs magnitudes ~2^51)
    val l = left.withColumn("__bin",
      floor(leftTs / band).cast("long"))
    val r0 = right.withColumn("__rbin",
      floor(rightTs / band).cast("long"))
    val r = r0.withColumn("__bin",
      explode(array(col("__rbin") - 1, col("__rbin"),
        col("__rbin") + 1)))
      .drop("__rbin")
    l.join(r, Seq("__bin"))
      .where(abs(leftTs - rightTs) <= band)
      .drop("__bin")
  }
}
