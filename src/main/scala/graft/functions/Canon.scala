package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, round, when}

/** Cross-engine canonicalization for rounded double outputs.
  *
  * `round(x, d)` of a tiny negative double is `+0.0` in Spark (the rounding
  * goes through Decimal, which has no signed zero) but `-0.0` in DuckDB
  * (sign-preserving float rounding). Cell-equality treats the two as equal,
  * so every local comparison passes — but a byte-level hash of the output
  * distinguishes the sign bit (the r14 `emb_corr_matrix` failure: two sf0.01
  * cells rounded to zero from below). Any registered query that emits a
  * rounded DOUBLE column is exposed; integer quantizations
  * (`round(x*100).cast("long")`) are not, since integers carry no sign bit
  * on zero.
  *
  * The fix is symmetric canonicalization: every rounded-double output goes
  * through [[roundCanon]] on the Spark side and carries a `+ 0.0` (IEEE:
  * `-0.0 + 0.0 = +0.0`, identity for every other value, NULL-preserving) on
  * the oracle side. CanonSpec pins the -1e-9 → +0.0 round-trip.
  */
object Canon {

  /** `round(c, scale)` with the zero sign bit forced positive. The
    * `when(r === 0, ...)` predicate is true for both zeros (SQL equality
    * ignores the sign bit), false for NaN, and null-preserving, so only
    * ±0.0 is rewritten. Kept as an explicit CASE rather than `+ 0.0` so no
    * present-or-future optimizer rule can fold the guard away as an
    * additive identity.
    */
  def roundCanon(c: Column, scale: Int): Column = {
    val r = round(c, scale)
    when(r === 0, lit(0d)).otherwise(r)
  }

  /** Canonicalize an already-computed double column (no rounding). */
  def zeroCanon(c: Column): Column = when(c === 0, lit(0d)).otherwise(c)
}
