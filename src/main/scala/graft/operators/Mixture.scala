package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Domain-mixture rebalancing — hit target per-domain proportions by
  * deterministic downsampling (the "data mixture" step every
  * training-data pipeline runs: cap the dominant crawl, keep the rare
  * domains whole).
  *
  * Per stratum `s` with `n_s` rows in a corpus of `N`, a target of
  * `pct`% of the FINAL mix means keep-fraction `min(1, pct·N /
  * (100·n_s))`. The keep decision is the same engine-portable
  * hash-threshold predicate as [[Sampling]], but with EXACT integer
  * arithmetic so the oracle can derive the data-dependent threshold
  * itself: row kept iff
  *
  *   u60(md5(key)) · 100·n_s  <  2⁶⁰ · pct · N
  *
  * where u60 is the first 15 hex chars of the digest as a 60-bit int.
  * Every operand is an integer (Decimal(38,0) here, HUGEINT in the
  * oracle) — no float rounding to disagree on. The `min(1, ·)` is
  * automatic: u60 < 2⁶⁰, so a stratum at-or-under target keeps all.
  *
  * Scale: ONE tiny per-stratum count agg (strata are few) to size the
  * thresholds, then a pure per-row predicate — zero shuffles on the
  * data path, the same rows kept on every run and partitioning. */
object Mixture {

  private val Two60 = BigInt(1) << 60

  /** 60-bit uniform hash of `keyCols` (+salt) — [[Sampling]]'s digest
    * discipline, numeric instead of lexicographic. */
  private def u60(keyCols: Seq[String], salt: String): Column =
    conv(substring(
      md5(concat_ws("|", (keyCols.map(col) :+ lit(salt)): _*)), 1, 15),
      16, 10).cast(DecimalType(20, 0))

  /** Downsample each stratum listed in `targetPct` (percent of the
    * ORIGINAL corpus size N it may occupy) to its target; unlisted
    * strata are kept whole. Rows with a NULL stratum are kept. */
  def rebalance(df: DataFrame, strataCol: String, keyCols: Seq[String],
      targetPct: Map[String, Int], salt: String = ""): DataFrame = {
    require(targetPct.values.forall(p => p >= 0 && p <= 100),
      s"target percentages must be 0..100: $targetPct")
    // one small action: per-stratum counts (strata are few — domains,
    // languages — never rows)
    val grouped = df.groupBy(col(strataCol).cast("string").as("__s"))
      .count().collect()
    val counts =
      grouped.flatMap(r => Option(r.getString(0)).map(_ -> r.getLong(1))).toMap
    // N is the ORIGINAL corpus size — the NULL stratum (kept whole)
    // still counts toward it, so its group row is summed even though
    // it can never be a threshold target
    val total = grouped.map(_.getLong(1)).sum
    val hash = u60(keyCols, salt)
    val keep = targetPct.foldLeft(when(lit(false), lit(false))) {
      case (acc, (stratum, pct)) =>
        val ns = counts.getOrElse(stratum, 0L)
        val lhsMult = new java.math.BigDecimal(100L * ns)
        val rhs = new java.math.BigDecimal(
          (Two60 * pct * total).bigInteger)
        acc.when(col(strataCol) === stratum, hash * lit(lhsMult) < lit(rhs))
    }.otherwise(lit(true))
    df.where(keep)
  }
}
