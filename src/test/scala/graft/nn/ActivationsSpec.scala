package graft.nn

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** F8: the Column-level activations must agree with the batch kernel's
  * scalar arms (Kernel.forward SigmoidSpec / TanhSpec / ReluSpec:
  * 1/(1+exp(-v)), java.lang.Math.tanh, if (v>0) v else 0.0) bit-for-bit
  * on every double — both paths are the same IEEE-754 expressions, so
  * the comparison is exact equality, not a tolerance.
  */
class ActivationsSpec extends SparkSpec {

  // the grid crosses zero, ±0.0, saturation, subnormal-ish and large
  // magnitudes, ±Inf and NaN — every branch and rounding regime of the
  // three arms (NaN pins the Catalyst-vs-Java comparison divergence:
  // Spark SQL orders NaN above every double, so a bare `when(x > 0)`
  // relu would return NaN where the kernel's `if (v > 0)` returns 0.0)
  private val grid: Seq[Double] = Seq(
    -1e9, -700.0, -20.0, -3.5, -1.0, -0.25, -1e-12, -0.0, 0.0, 1e-12,
    0.25, 1.0, 3.5, 20.0, 700.0, 1e9,
    Double.NegativeInfinity, Double.PositiveInfinity, Double.NaN)

  it("Column sigmoid/tanh/relu equal the kernel's scalar math exactly") {
    import spark.implicits._
    // doubleToLongBits canonicalizes NaN, so NaN == NaN here and the
    // exact-equality contract extends to the whole grid
    def bits(d: Double): Long = java.lang.Double.doubleToLongBits(d)
    val rows = grid.toDF("x")
      .select(col("x"),
        Activations.sigmoid(col("x")).as("sig"),
        Activations.tanh(col("x")).as("th"),
        Activations.relu(col("x")).as("re"))
      .collect()
    rows.foreach { r =>
      val x = r.getDouble(0)
      // Kernel.forward scalar arms, verbatim
      val kSig = 1.0 / (1.0 + math.exp(-x))
      val kTanh = math.tanh(x)
      val kRelu = if (x > 0) x else 0.0
      assert(bits(r.getDouble(1)) == bits(kSig), s"sigmoid($x)")
      assert(bits(r.getDouble(2)) == bits(kTanh), s"tanh($x)")
      assert(bits(r.getDouble(3)) == bits(kRelu), s"relu($x)")
    }
  }

  it("all three activations propagate SQL NULL (ADVICE r9)") {
    import spark.implicits._
    // relu's isnan guard made NULL fall through to otherwise(0.0)
    // while sigmoid/tanh propagated it — one Column API surface, one
    // null semantics: NULL in, NULL out on all three
    val out = Seq[Option[Double]](None).toDF("x")
      .select(Activations.sigmoid(col("x")).as("sig"),
        Activations.tanh(col("x")).as("th"),
        Activations.relu(col("x")).as("re"))
      .head()
    assert(out.isNullAt(0) && out.isNullAt(1) && out.isNullAt(2),
      s"expected NULL,NULL,NULL got $out")
  }

  it("relu maps -0.0 and +0.0 both to +0.0 like the kernel") {
    import spark.implicits._
    val out = Seq(-0.0, 0.0).toDF("x")
      .select(Activations.relu(col("x")).as("re")).collect()
    out.foreach { r =>
      val bits = java.lang.Double.doubleToRawLongBits(r.getDouble(0))
      assert(bits == 0L, "expected +0.0")
    }
  }
}
