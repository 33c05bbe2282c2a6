package graft.nn

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F8 — the training kernel's activation functions exposed as Catalyst
  * Columns (reference: `Simulation_Models/model_structures.py` uses
  * `nn.Sigmoid()` / `nn.Tanh()` / `nn.ReLU()` inside every encoder /
  * decoder stack; SURVEY §2.8 F8). The batch kernel applies the same
  * scalar math matrix-locally inside `Kernel.forward`
  * (SigmoidSpec/TanhSpec/ReluSpec arms); these Column forms are the
  * engine-surface equivalent for users applying activations to columns
  * of a DataFrame — pure codegen'd expressions, no UDFs, so they stay
  * inside whole-stage codegen at any scale. `ActivationsSpec` pins the
  * Column forms to the kernel's scalar math on a value grid.
  */
object Activations {

  /** 1 / (1 + e^-x) — same expression shape the kernel evaluates, so the
    * two paths agree bit-for-bit on every double. */
  def sigmoid(x: Column): Column = lit(1.0) / (lit(1.0) + exp(-x))

  /** Hyperbolic tangent; both this and the kernel delegate to
    * `java.lang.Math.tanh`. */
  def tanh(x: Column): Column = org.apache.spark.sql.functions.tanh(x)

  /** The kernel's arm verbatim: `if (v > 0) v else 0.0`. NOT
    * `greatest(x, 0.0)` — greatest's nan-safe compare treats -0.0 and
    * +0.0 as equal and would keep the first child's -0.0, where the
    * kernel (and torch relu) return +0.0. NOT a bare `when(x > 0)`
    * either — Spark SQL's comparison orders NaN above every double, so
    * `NaN > 0.0` is TRUE in Catalyst where Java's primitive compare is
    * false; the isnan guard keeps relu(NaN) = 0.0 on both paths. The
    * leading isNull arm makes SQL NULL propagate (ADVICE r9: without
    * it, `isnan(NULL)` is false and NULL fell through to the
    * otherwise(0.0), diverging from sigmoid/tanh which both propagate
    * NULL — the kernel never sees NULLs, so only the Column surface
    * needed the guard). */
  def relu(x: Column): Column =
    when(x.isNull, lit(null).cast("double"))
      .when(!isnan(x) && x > lit(0.0), x).otherwise(lit(0.0))
}
