package graft

import graft.functions.Canon.{roundCanon, zeroCanon}
import org.apache.spark.sql.functions._

/** Pins the ±0.0 canonicalization contract (r14 emb_corr_matrix failure):
  * a tiny negative double that rounds to zero must come out with a POSITIVE
  * sign bit, because the driver hashes the raw bytes while DuckDB's round()
  * preserves the sign. The oracle side carries the symmetric `+ 0.0`.
  */
class CanonSpec extends SparkSpec {

  private def bits(d: java.lang.Double): Option[Long] =
    Option(d).map(v => java.lang.Double.doubleToRawLongBits(v))

  private def canonOf(input: Any): Option[Long] = {
    import spark.implicits._
    val df = Seq(Option(input).map(_.asInstanceOf[Double])).toDF("x")
    val v = df.select(roundCanon(col("x"), 4).as("r"))
      .collect()(0)
    if (v.isNullAt(0)) None else bits(v.getDouble(0))
  }

  private val posZero = java.lang.Double.doubleToRawLongBits(0.0)

  test("roundCanon: -1e-9 rounds to POSITIVE zero (sign bit clear)") {
    assert(canonOf(-1e-9) === Some(posZero))
  }

  test("roundCanon: -0.0 input canonicalizes to +0.0") {
    assert(canonOf(-0.0) === Some(posZero))
  }

  test("roundCanon: +0.0 and exact zero stay +0.0") {
    assert(canonOf(0.0) === Some(posZero))
    assert(canonOf(1e-9) === Some(posZero))
  }

  test("roundCanon: non-zero values are untouched") {
    assert(canonOf(0.12344999) === bits(0.1234))
    assert(canonOf(-0.5) === bits(-0.5))
    assert(canonOf(123.456789) === bits(123.4568))
  }

  test("roundCanon: null propagates") {
    assert(canonOf(null) === None)
  }

  test("zeroCanon: flips -0.0 only") {
    import spark.implicits._
    val out = Seq(-0.0, 0.0, -1.5, Double.NaN).toDF("x")
      .select(zeroCanon(col("x")).as("c")).collect().map(_.getDouble(0))
    assert(java.lang.Double.doubleToRawLongBits(out(0)) === posZero)
    assert(java.lang.Double.doubleToRawLongBits(out(1)) === posZero)
    assert(out(2) === -1.5)
    assert(out(3).isNaN)
  }

  test("spark round() itself canonicalizes -0.0 (documents why the oracle " +
    "side needs + 0.0: DuckDB's round preserves the sign)") {
    import spark.implicits._
    val v = Seq(-1e-9).toDF("x").select(round(col("x"), 4)).collect()(0).getDouble(0)
    assert(java.lang.Double.doubleToRawLongBits(v) === posZero)
  }
}
