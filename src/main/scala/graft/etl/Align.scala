package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J1 — key-aligned pairing of two omics views.
  *
  * The reference asserts positional index equality then zips rows
  * (`np.alltrue(RNA_df.index == miRNA_df.index)` —
  * Simulation_Models/CNC_AE_model_selection.py:510-518). Set-oriented
  * equivalent: inner equi-join on sample_id plus a count assertion that
  * no key was lost (the same guarantee, order-free). Catalyst picks
  * broadcast vs sort-merge; at 100 TB both sides pre-bucketed by
  * sample_id avoid the shuffle entirely.
  */
object Align {

  final case class MisalignedViewsException(msg: String)
    extends RuntimeException(msg)

  /** (sample_id, x1, x2) with x1 from `a.features`, x2 from `b.features`. */
  def pair(a: DataFrame, b: DataFrame): DataFrame = {
    val joined = a.select(col("sample_id"), col("features").as("x1"))
      .join(b.select(col("sample_id"), col("features").as("x2")), "sample_id")
    val (na, nb, nj) = (a.count(), b.count(), joined.count())
    if (na != nb || nb != nj)
      throw MisalignedViewsException(
        s"Data are not aligned: |x1|=$na |x2|=$nb |join|=$nj")
    joined
  }
}
