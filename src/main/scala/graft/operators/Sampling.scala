package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * Mechanism: a row is kept iff the MD5 hex digest of its key (plus an
  * optional salt) is lexicographically below the threshold digest that
  * corresponds to the keep-fraction — `md5 < hex(⌊p·2¹²⁸⌋)`. MD5's
  * uniformity makes the rate exact in expectation; the comparison is a
  * plain per-row predicate, so sampling is embarrassingly parallel:
  * zero shuffles, prunes nothing from pushdown, and the SAME rows are
  * kept on every run, every partitioning, and every engine with md5()
  * (the DuckDB oracle mirrors it verbatim) — unlike `df.sample`, whose
  * output depends on partition layout. Different salts give independent
  * samples; the same salt gives a nested hierarchy (p=0.1 ⊂ p=0.5). */
object Sampling {

  /** 32-hex-char threshold for keep-fraction `p`: hex(⌊p·2¹²⁸⌋).
    * `p = 1.0` returns `"g"`, which every hex digest sorts below —
    * keep-all is exact, not 1 − 2⁻¹²⁸. */
  private[operators] def thresholdHex(p: Double): String = {
    require(p >= 0.0 && p <= 1.0, s"fraction $p out of [0,1]")
    if (p == 1.0) return "g"
    val scaled = (BigDecimal(p) * BigDecimal(BigInt(1) << 128))
      .toBigInt.max(BigInt(0))
    val hex = scaled.toString(16)
    ("0" * (32 - hex.length)) + hex
  }

  private def hashOf(keyCols: Seq[String], salt: String): Column =
    md5(concat_ws("|", (keyCols.map(col) :+ lit(salt)): _*))

  /** Keep `fraction` of rows, decided by the hash of `keyCols` (+salt).
    * Keying on a stable id makes the decision a property of the ROW,
    * not of the run. */
  def deterministic(df: DataFrame, keyCols: Seq[String],
      fraction: Double, salt: String = ""): DataFrame =
    df.where(hashOf(keyCols, salt) < lit(thresholdHex(fraction)))

  /** Per-stratum keep-fractions (e.g. downsample the dominant language:
    * `Map("en" -> 0.5)`), `defaultFraction` for strata not listed.
    * One CASE expression — still a pure per-row predicate. */
  def stratified(df: DataFrame, strataCol: String,
      fractions: Map[String, Double], keyCols: Seq[String],
      defaultFraction: Double = 1.0, salt: String = ""): DataFrame = {
    val threshold = fractions.foldLeft(
        when(lit(false), lit(""))) { case (acc, (stratum, p)) =>
        acc.when(col(strataCol) === stratum, lit(thresholdHex(p)))
      }.otherwise(lit(thresholdHex(defaultFraction)))
    df.where(hashOf(keyCols, salt) < threshold)
  }
}
