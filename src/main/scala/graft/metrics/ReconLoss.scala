package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reconstruction-loss and orthogonality aggregates over array-column
  * embeddings — all codegen'd higher-order expressions, no UDFs.
  *
  * Reference semantics:
  *  - F1 row L2-normalize: `F.normalize(x, p=2, dim=1)`
  *    (Evaluation_Auxiliary/model_structures.py:1470-1471).
  *  - A9 batch loss: Frobenius norm of difference of row-normalized
  *    matrices (Simulation_Models/CNC_AE_model_selection.py:209-229).
  *  - A10 per-subject loss: row-wise L2 of the difference
  *    (Evaluation_Auxiliary/reconloss_from_retrained_models.py:45,69-72).
  *  - A11 O1 ortho: mean of elementwise product of normalized matrices
  *    (model_structures.py:1466-1474).
  *  - A12 O2: Σ diag(z12·z1ᵀ)² — squared per-SAMPLE dots
  *    (Simulation_Models/JISAE-O2_selection.py:266-305).
  *  - A13 O3: Σ diag(z12ᵀ·z1)² — squared per-DIMENSION dots
  *    (Simulation_Models/JISAE-O3_selection.py:266-300).
  */
object ReconLoss {

  /** Σ x² over an array column. */
  def sumSq(c: Column): Column =
    aggregate(c, lit(0.0), (acc, x) => acc + x * x)

  /** F1 — row L2 normalization (zero rows stay zero, torch semantics:
    * F.normalize uses max(norm, eps) with eps=1e-12). The norm is hoisted
    * into a one-element transform binding so it's computed ONCE per row,
    * not per element (O(w) instead of O(w²) at 20k-wide features). */
  def l2NormalizeRows(c: Column): Column =
    element_at(
      transform(array(greatest(sqrt(sumSq(c)), lit(1e-12))),
        n => transform(c, x => x / n)), 1)

  /** ‖a−b‖₂ per row. */
  def rowDist(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v))

  /** A10 — per-subject recon loss of a two-view AE: rows (sample_id,
    * loss = ‖x1n−x1hatn‖ + ‖x2n−x2hatn‖) with all four matrices
    * row-normalized first (reconloss_from_retrained_models.py:45). */
  def perSubject(df: DataFrame, x1: String, x1hat: String,
      x2: String, x2hat: String, idCol: String = "sample_id"): DataFrame =
    df.select(col(idCol),
      (rowDist(l2NormalizeRows(col(x1)), l2NormalizeRows(col(x1hat))) +
       rowDist(l2NormalizeRows(col(x2)), l2NormalizeRows(col(x2hat))))
        .as("recon_loss"))

  /** A9 — batch Frobenius loss: ‖A'−B'‖_F over row-normalized matrices. */
  def frobenius(df: DataFrame, a: String, b: String): Double =
    df.select(aggregate(
        zip_with(l2NormalizeRows(col(a)), l2NormalizeRows(col(b)),
          (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v).as("ss"))
      .agg(sqrt(sum("ss"))).head().getDouble(0)

  /** A11 — O1 orthogonality: mean over ALL matrix elements of the
    * elementwise product of row-normalized embeddings. */
  def orthoO1(df: DataFrame, a: String, b: String): Double =
    df.select(
        aggregate(zip_with(l2NormalizeRows(col(a)), l2NormalizeRows(col(b)),
          (x, y) => x * y), lit(0.0), (acc, v) => acc + v).as("rowSum"),
        size(col(a)).as("w"))
      .agg(sum("rowSum") / sum("w")).head().getDouble(0)

  /** A12 — O2 orthogonality: Σ_rows (row dot of normalized embeddings)². */
  def orthoO2(df: DataFrame, a: String, b: String): Double =
    df.select(aggregate(
        zip_with(l2NormalizeRows(col(a)), l2NormalizeRows(col(b)),
          (x, y) => x * y), lit(0.0), (acc, v) => acc + v).as("dot"))
      .agg(sum(pow(col("dot"), 2))).head().getDouble(0)

  /** A13 — O3 orthogonality: Σ_dims (per-dimension dot across rows)².
    * Long-form posexplode → per-dim sums: one shuffle of (dim, product)
    * pairs, map-side combined. */
  def orthoO3(df: DataFrame, a: String, b: String): Double =
    df.select(posexplode(
        zip_with(l2NormalizeRows(col(a)), l2NormalizeRows(col(b)),
          (x, y) => x * y)).as(Seq("dim", "prod")))
      .groupBy("dim").agg(sum("prod").as("colDot"))
      .agg(sum(pow(col("colDot"), 2))).head().getDouble(0)

  /** F7 — elementwise mean of two/three embedding arrays
    * (embedding_from_retrained_models.py:81; mocss.py:527). */
  def meanOf2(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => (x + y) / 2)
  def meanOf3(a: Column, b: Column, c: Column): Column =
    zip_with(zip_with(a, b, (x, y) => x + y), c, (xy, z) => (xy + z) / 3)
}
