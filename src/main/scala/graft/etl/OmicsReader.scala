package graft.etl

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Ingestion of omics feature matrices into the engine's canonical shape
  * `(sample_id: String, features: Array[Double])` + a feature-name dim
  * table `(feature_idx: Int, feature_name: String)`.
  *
  * Replicates the reference's two load paths
  * (ref: Simulation_Models/CNC_AE_model_selection.py:507-508 — features-
  * as-rows TSV loaded with `pd.read_csv(sep='\t').T`; AE_results.ipynb
  * cell 67 — samples-as-rows TSV) as declarative Spark plans.
  *
  * Scale notes: one array column, never tens of thousands of scalar
  * columns (Catalyst plans stay small, projections stay narrow). The
  * transpose goes through long form `(feature_idx, sample_idx, value)` —
  * a single shuffle keyed by sample, the documented SURVEY §4.3 path; at
  * 100 TB the long form itself is the storage format and this reader is
  * only the edge adapter.
  */
object OmicsReader {

  final case class OmicsMatrix(data: DataFrame, featureNames: DataFrame)

  /** Appends a 0-based file-order row index. Distributed: RDD
    * `zipWithIndex` (file-split partitions are ordered by offset, so
    * partition order IS file order; one extra tiny job computes the
    * per-partition offsets) — never a no-partition window, which would
    * funnel the whole ingest through a single task at scale. The index
    * is LongType: zipWithIndex is already Long, and an Int column would
    * silently wrap negative past 2^31 rows and mis-align positional
    * joins (j3) instead of failing (ADVICE r10). */
  private[graft] def withRowIdx(df: DataFrame, name: String): DataFrame = {
    val schema = df.schema.add(name, LongType, nullable = false)
    val rdd = df.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Features-as-rows TSV with an R-style header (header row has one
    * column fewer than data rows; data rows lead with the feature id).
    * Returns samples as rows, feature order preserved from the file
    * (matching the reference's pandas `.T`).
    */
  def readTransposed(spark: SparkSession, path: String): OmicsMatrix = {
    // The R-style header has one column FEWER than the data rows; Spark
    // would infer the narrow schema from it and silently drop the last
    // data column — so count columns from the first line and force an
    // explicit (n+1)-wide string schema.
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val nHeaderCols = spark.read.text(path).head().getString(0).split("\t").length
    val schema = StructType(
      (0 to nHeaderCols).map(i => StructField(s"_c$i", StringType)))
    val raw = spark.read.option("sep", "\t").schema(schema).csv(path)
    val cols = raw.columns
    val lastCol = cols.last
    // R-style header row is the only row with no value in the last slot.
    val headerRow = raw.filter(col(lastCol).isNull).head()
    val sampleIds = (0 until cols.length - 1).map(headerRow.getString)

    val data = raw.filter(col(lastCol).isNotNull)
    // Stable feature index in file order (distributed zipWithIndex).
    val indexed = withRowIdx(data, "feature_idx")
    val featureNames = indexed
      .select(col("feature_idx"), col(cols.head).as("feature_name"))

    val valueCols = array(scala.collection.immutable.ArraySeq
      .unsafeWrapArray(cols.tail.map(c => col(c).cast("double"))): _*)
    val long = indexed.select(col("feature_idx"),
      posexplode(valueCols).as(Seq("sample_idx", "value")))

    val sampleDim = spark.createDataFrame(
      sampleIds.zipWithIndex.map { case (s, i) => (i, s) }
    ).toDF("sample_idx", "sample_id")

    val wide = long
      .join(broadcast(sampleDim), "sample_idx")
      .groupBy("sample_id")
      .agg(transform(
        array_sort(collect_list(struct(col("feature_idx"), col("value")))),
        s => s.getField("value")).as("features"))
    OmicsMatrix(wide, featureNames)
  }

  /** Samples-as-rows TSV (TCGA shape): header present, `idCol` holds the
    * sample id, every other column is one feature (file column order kept).
    *
    * Implementation is read-as-TEXT + ONE split per row, NOT a csv scan
    * with one Spark column per feature. At the real TCGA width (20531
    * genes + id = 20532 columns) the csv formulation fails twice over:
    * univocity's default maxColumns (20480) rejects the file outright,
    * and the 20k-child CreateArray projection blows past the JVM/JIT
    * method limits — the generated class splits into thousands of
    * `apply_0_NNNN` methods that run interpreted (measured round 7: the
    * 1866×20531 ingest burned 25 CPU-minutes per task without
    * finishing; the text+split plan ingests the same file in seconds
    * and its plan size is O(1) in the width). Numeric TSV matrices
    * never quote fields, so the raw split is exact. */
  def readSamplesAsRows(spark: SparkSession, path: String,
      idCol: String = "_c0", header: Boolean = true): OmicsMatrix = {
    val lines = spark.read.text(path)
    val firstLine = lines.head().getString(0)
    val firstCells = firstLine.split("\t", -1)
    val (names, idIdx, data0) =
      if (header) {
        // id column: a named header cell, or the pandas empty index
        // cell (which a csv reader would surface as "_c0")
        val i = firstCells.indexOf(idCol) match {
          case -1 if idCol == "_c0" => 0
          case -1 => throw new IllegalArgumentException(
            s"id column '$idCol' not present in header")
          case found => found
        }
        // drop every header line (multi-part files repeat it; data
        // lines are numeric so they can never equal the header)
        (firstCells, i, lines.filter(col("value") =!= lit(firstLine)))
      } else {
        val i = idCol.stripPrefix("_c").toInt
        ((0 until firstCells.length).map(j => s"_c$j").toArray, i, lines)
      }
    val n = names.length
    val parts = split(col("value"), "\t", -1)
    val featSlice =
      if (idIdx == 0) slice(parts, 2, n - 1)
      else if (idIdx == n - 1) slice(parts, 1, n - 1)
      else concat(slice(parts, 1, idIdx),
        slice(parts, idIdx + 2, n - 1 - idIdx))
    // ANSI hazard (found by the s2 oracle): a downstream Generate over
    // `features` makes InferFiltersFromGenerate copy a
    // size(features) > 0 predicate into the SAME Filter as the
    // header-drop conjunct, and codegen subexpression elimination then
    // evaluates the shared transform() — strict cast included — BEFORE
    // the header-equality check short-circuits, so the cast throws on
    // the very header row the filter exists to drop. Guarding the
    // lambda on the header line keeps ANSI strictness for data rows
    // (malformed numerics still fail loudly) while making the header
    // row yield nulls instead of throwing wherever the optimizer
    // chooses to evaluate it; the header-drop filter still removes it
    // from the output.
    val featCast =
      if (header)
        transform(featSlice, s =>
          when(col("value") === lit(firstLine),
            lit(null).cast("double")).otherwise(s.cast("double")))
      else transform(featSlice, s => s.cast("double"))
    val data = data0.select(
      element_at(parts, idIdx + 1).as("sample_id"),
      featCast.as("features"))
    val featNames = names.zipWithIndex.filter(_._2 != idIdx).map(_._1)
    val nameDim = spark.createDataFrame(
      featNames.toSeq.zipWithIndex.map { case (nm, i) => (i, nm) }
    ).toDF("feature_idx", "feature_name")
    OmicsMatrix(data, nameDim)
  }

  /** S5 — whitespace-delimited numeric matrix (np.loadtxt semantics:
    * any run of whitespace separates, no header —
    * ref: Simulation_Auxiliary/test_metrics.py:5). Row order preserved
    * via distributed zipWithIndex (file order). */
  def readWhitespaceMatrix(spark: SparkSession, path: String): DataFrame =
    withRowIdx(spark.read.text(path), "row_idx")
      .select(col("row_idx"),
        transform(split(trim(col("value")), "\\s+"),
          s => s.cast("double")).as("values"))

  /** Positionally-aligned label file (single column, no header beyond a
    * `0` placeholder — ref: TCGA_Data/labels.csv, AE_results.ipynb cell
    * 67). Joined to samples by row position.
    */
  def readLabels(spark: SparkSession, path: String): DataFrame =
    withRowIdx(
      spark.read.option("sep", "\t").option("header", true).csv(path),
      "sample_idx")
      .withColumnRenamed("0", "label")
}
