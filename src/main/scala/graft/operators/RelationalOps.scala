package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables => T}

/** Relational operator surface of the engine, one named query per [SQL]
  * operator in SURVEY.md §2, patterned onto the driver's TPC-H-ish testdata
  * (FIXTURES.md §2). Every query is declarative DataFrame API — Catalyst
  * plans scans with column pruning + predicate pushdown, picks broadcast
  * joins for the small dimension sides, and AQE re-plans shuffles at scale.
  *
  * Determinism contract: every result carries a unique ORDER BY and every
  * computed double is rounded, so the DuckDB oracle hash-compares stably.
  */
object RelationalOps {

  /** Deterministic seeded pseudo-random order, expressible identically in
    * Spark and ANSI SQL (Knuth multiplicative hash — public domain, TAOCP
    * vol.3 §6.4). Replaces `np.random.choice(seed)` of the reference
    * (`TCGA_Auxiliary/Data_prep.py:16-58`) with a scalable, reproducible
    * ordering: exact per-class counts, no RNG state, no driver involvement.
    *
    * Computes (key·2654435761 + seed) mod 2^32 WITHOUT the naive 64-bit
    * product, which overflows (ANSI error under Spark's default
    * ansi.enabled, wrong sign otherwise) once key ≥ 2^63/2654435761
    * ≈ 3.47e9 — hit for real on the ×100 blow-up probe's shifted doc_ids
    * (BENCH_SCALES.md §beyond-sf0.1). Algebra: with k = key mod 2^32
    * split as k = 65536·hi + lo (hi, lo < 2^16),
    *   2654435761·k ≡ (2654435761·hi mod 2^32)·65536 + 2654435761·lo
    *                                                        (mod 2^32),
    * and every intermediate stays below 2^49. Bit-identical to the naive
    * formula wherever that one doesn't overflow, so existing splits,
    * samples and oracles are unchanged.
    */
  def knuthHash(key: Column, seed: Long): Column = {
    val m  = lit(4294967296L)
    val k  = pmod(key, m)
    val hi = shiftright(k, 16)
    val lo = k.bitwiseAND(lit(65535L))
    pmod(pmod(hi * lit(2654435761L), m) * lit(65536L)
      + lo * lit(2654435761L) + lit(seed), m)
  }

  /** DuckDB twin of [[knuthHash]] (`//` = DuckDB integer division; the
    * oracle SQL is executed by DuckDB only). */
  def knuthSql(key: String, seed: Long): String = {
    val k = s"(($key) % 4294967296)"
    s"((((($k // 65536) * 2654435761) % 4294967296) * 65536" +
      s" + ($k % 65536) * 2654435761 + $seed) % 4294967296)"
  }

  /** F6 — the reference's piecewise hyperparameter-cell formatter
    * (`format_cell`, Evaluation_Auxiliary/AE_results.ipynb cell 11) as a
    * codegen'd when-chain; fully expressible in ANSI SQL (CASE+printf).
    *
    * The NaN test is hoisted FIRST: both Spark SQL and DuckDB order NaN
    * above every numeric, so the reference's late `np.isnan` branch would
    * be unreachable behind `val >= 1` — hoisting keeps the Python
    * semantics (where NaN >= 1 is False) on both engines. The exact
    * equality sentinels (0.1, 0.01, …) are safe across engines: both
    * compare the identical IEEE-754 doubles. %.Nf parity holds because no
    * double ties exactly at a decimal boundary for N ≥ 1 (odd/2·10^N has
    * no power-of-two denominator); %.0f CAN tie (x.5 is representable) —
    * callers feed it values ≥ 1 that are integral sums, matching the
    * reference's epoch/batch-size cells. */
  def formatCell(v: Column): Column =
    when(isnan(v), lit("NA"))
      .when(v >= 1, format_string("%.0f", v))
      .when(v === 0, lit("0"))
      .when(v === 0.1, lit("0.1"))
      .when(v === 0.01, lit("0.01"))
      .when(v === 0.2, lit("0.2"))
      .when(v === 0.4, lit("0.4"))
      .when(v === 0.6, lit("0.6"))
      .when(v < 0.0001, format_string("%.7f", v))
      .otherwise(format_string("%.4f", v))

  val defs: Seq[QueryDef] = Seq(

    // ---- §2.1 scans ------------------------------------------------------
    // S1/S2: matrix scan with projection + predicate; at scale the filter
    // and the 2-column ReadSchema must reach the parquet scan
    // (ref: Simulation_Models/CNC_AE_model_selection.py:507-508).
    QueryDef(
      "s1_scan_project",
      (s, d) => T.lineitem(s, d)
        .filter(col("l_quantity") > 45)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice
              FROM lineitem WHERE l_quantity > 45
              ORDER BY l_orderkey, l_linenumber""")),

    // S3: small full-table scan (label file analog).
    QueryDef(
      "s3_label_scan",
      (s, d) => T.region(s, d).orderBy("r_regionkey"),
      Some("SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey")),

    // S2: samples-as-rows TSV scan — the reference's untransposed load
    // path (AE_results.ipynb cell 67: pd.read_csv(sep='\t') without
    // .T). The query exercises the REAL machinery end to end: render a
    // header TSV (pandas to_csv(sep='\t') shape) from `supplier`,
    // ingest it through the O(1)-plan-width text+split reader
    // (OmicsReader.readSamplesAsRows — the path proven at 20 532
    // columns), and unpivot to long form. Oracle: plain SQL over the
    // same parquet rows — the j8 recipe: the roundtrip must be
    // value-faithful (Double.toString → cast round-trips exactly), so
    // parquet-sourced SQL is the same relation.
    QueryDef(
      "s2_samples_scan",
      (s, d) => {
        import graft.etl.{OmicsReader, ScaleUtils}
        val dir = s"${sys.props("java.io.tmpdir")}/graft_s2_" +
          ScaleUtils.pathTag(d)
        graft.pipeline.ResultTables.writeTsv(
          T.supplier(s, d).select(col("s_name").as("sample_id"),
            col("s_acctbal"),
            col("s_nationkey").cast("double").as("s_nationkey"),
            col("s_suppkey").cast("double").as("s_suppkey")), dir)
        val m = OmicsReader.readSamplesAsRows(s, dir, idCol = "sample_id")
        m.data.select(col("sample_id"), posexplode(col("features")))
          .join(broadcast(m.featureNames),
            col("pos") === col("feature_idx"))
          .select(col("sample_id"), col("feature_name"),
            col("col").as("value"))
          .orderBy("sample_id", "feature_name")
      },
      Some("""SELECT s_name AS sample_id, 's_acctbal' AS feature_name,
                     s_acctbal AS value FROM supplier
              UNION ALL
              SELECT s_name, 's_nationkey', CAST(s_nationkey AS DOUBLE)
              FROM supplier
              UNION ALL
              SELECT s_name, 's_suppkey', CAST(s_suppkey AS DOUBLE)
              FROM supplier
              ORDER BY sample_id, feature_name""")),

    // S4: headerless CSV scan by positional column convention
    // (Simulation_Auxiliary/mocss.py:370-373 reads matrices with
    // header=None; columns are addressed by position). Same
    // render-then-ingest recipe as s2, through the header=false arm.
    QueryDef(
      "s4_headerless_scan",
      (s, d) => {
        import graft.etl.{OmicsReader, ScaleUtils}
        val dir = s"${sys.props("java.io.tmpdir")}/graft_s4_" +
          ScaleUtils.pathTag(d)
        T.nation(s, d).select(col("n_name"),
            col("n_nationkey").cast("double"),
            col("n_regionkey").cast("double"))
          .coalesce(1).write.mode("overwrite")
          .option("sep", "\t").csv(dir)
        val m = OmicsReader.readSamplesAsRows(s, dir, header = false)
        m.data.select(col("sample_id"),
            element_at(col("features"), 1).as("f0"),
            element_at(col("features"), 2).as("f1"))
          .orderBy("sample_id")
      },
      Some("""SELECT n_name AS sample_id,
                     CAST(n_nationkey AS DOUBLE) AS f0,
                     CAST(n_regionkey AS DOUBLE) AS f1
              FROM nation ORDER BY sample_id""")),

    // ---- §2.2 projections / filters -------------------------------------
    // P1: row selection by key-set → left-semi join (Data_prep.py:65-68).
    QueryDef(
      "p1_semi_join",
      (s, d) => T.customer(s, d)
        .join(T.orders(s, d).select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
              WHERE c_custkey IN (SELECT o_custkey FROM orders)
              ORDER BY c_custkey""")),

    // P2: per-class partition by label equality (Data_prep.py:26-38).
    QueryDef(
      "p2_label_filter",
      (s, d) => T.orders(s, d)
        .filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
              WHERE o_orderstatus = 'F' ORDER BY o_orderkey""")),

    // P4/P5: column drop + rename (CNC_AE_model_selection.py:515-516,
    // AE_results.ipynb cell 7).
    QueryDef(
      "p4_drop_rename",
      (s, d) => T.part(s, d)
        .drop("p_retailprice", "p_size")
        .withColumnRenamed("p_name", "part_name")
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_name AS part_name, p_brand, p_type
              FROM part ORDER BY p_partkey""")),

    // P6: dict-style key-substring filter (AE_results.ipynb cell 28:
    // `{k: v for k, v in d.items() if setting in k}`) — a pure
    // `contains` predicate, pushed to the parquet scan as a
    // StringContains filter. Keys here are document source tags
    // ("src0".."srcN"); substring "1" keeps the non-trivial subset
    // (src1, src10-19, src21, ...) so both branches carry rows.
    QueryDef(
      "p6_key_filter",
      (s, d) => T.documents(s, d)
        .filter(col("source").contains("1"))
        .select("doc_id", "source")
        .orderBy("doc_id"),
      Some("""SELECT doc_id, source FROM documents
              WHERE source LIKE '%1%' ORDER BY doc_id""")),

    // ---- §2.3 joins / set ops -------------------------------------------
    // J1: key-aligned equi-join of two views
    // (Simulation_Models/CNC_AE_model_selection.py:510-518). Catalyst picks
    // broadcast-hash for the small side; at 100 TB AQE switches to SMJ.
    QueryDef(
      "j1_equi_join",
      (s, d) => T.orders(s, d)
        .join(T.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_custkey"), col("c_mktsegment"),
          col("o_totalprice"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, c_custkey, c_mktsegment, o_totalprice
              FROM orders JOIN customer ON o_custkey = c_custkey
              ORDER BY o_orderkey""")),

    // J2: anti-join for held-out keys (Data_prep.py:56).
    QueryDef(
      "j2_anti_join",
      (s, d) => T.customer(s, d)
        .join(T.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
          .select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_acctbal")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_acctbal FROM customer
              WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                      WHERE o_orderpriority = '1-URGENT')
              ORDER BY c_custkey""")),

    // J3: positional feature concat — two views aligned BY ROW
    // POSITION, not by key (AE_results.ipynb cell 81 concatenates
    // embedding matrices positionally; ArchZoo/Inference do the same
    // for x1||x2). Each half gets an independent distributed row index
    // (OmicsReader.withRowIdx: RDD zipWithIndex over the sorted frame —
    // never a no-partition window), the halves join on it, and a
    // position-weighted checksum proves the concat preserved both the
    // row alignment and the intra-array order. Oracle: row position =
    // rank by vec_id on both sides; both engines fold the weighted sum
    // left-to-right in doubles, so round(4) is drift-free.
    QueryDef(
      "j3_positional_concat",
      (s, d) => {
        val base = T.embeddings(s, d).orderBy("vec_id")
        val a = graft.etl.OmicsReader.withRowIdx(
          base.select(col("vec_id"), slice(col("embedding"), 1, 32).as("x1")),
          "ridx")
        val b = graft.etl.OmicsReader.withRowIdx(
          base.select(slice(col("embedding"), 33, 32).as("x2")), "ridx")
        a.join(b, "ridx")
          .select(col("vec_id"), concat(col("x1"), col("x2")).as("e"))
          .select(col("vec_id"), size(col("e")).cast("long").as("width"),
            round(expr("aggregate(zip_with(e, sequence(1, size(e)), " +
              "(v, i) -> CAST(v AS DOUBLE) * i), 0D, (acc, x) -> acc + x)"),
              4).as("wsum"))
          .orderBy("vec_id")
      },
      Some("""WITH a AS (SELECT vec_id,
                     row_number() OVER (ORDER BY vec_id) AS ridx,
                     embedding[1:32] AS x1 FROM embeddings),
              b AS (SELECT row_number() OVER (ORDER BY vec_id) AS ridx,
                     embedding[33:64] AS x2 FROM embeddings),
              j AS (SELECT a.vec_id, list_concat(a.x1, b.x2) AS e
                    FROM a JOIN b USING (ridx))
              SELECT vec_id, len(e) AS width,
                     round(list_reduce(list_transform(range(1, len(e) + 1),
                       i -> CAST(e[i] AS DOUBLE) * i),
                       (acc, x) -> acc + x), 4) AS wsum
              FROM j ORDER BY vec_id""")),

    // J4: index union + distinct (AE_results.ipynb cell 52).
    QueryDef(
      "j4_union_distinct",
      (s, d) => {
        val o = T.orders(s, d)
        o.filter(col("o_orderstatus") === "F").select("o_custkey")
          .union(o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey"))
          .distinct()
          .orderBy("o_custkey")
      },
      Some("""SELECT DISTINCT o_custkey FROM (
                SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
                UNION ALL
                SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
              ORDER BY o_custkey""")),

    // J5: keyed horizontal concat of per-model tables → full outer join
    // (AE_results.ipynb cell 53). Two per-segment aggregate tables joined
    // on the key; nulls where a side is missing.
    QueryDef(
      "j5_outer_concat",
      (s, d) => {
        val c = T.customer(s, d)
        val a = c.filter(col("c_acctbal") > 5000).groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_rich"))
        val b = c.filter(col("c_acctbal") < 0).groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_debt"))
        a.join(b, Seq("c_mktsegment"), "full_outer").orderBy("c_mktsegment")
      },
      Some("""SELECT COALESCE(a.c_mktsegment, b.c_mktsegment) AS c_mktsegment,
                     a.n_rich, b.n_debt
              FROM (SELECT c_mktsegment, count(*) AS n_rich FROM customer
                    WHERE c_acctbal > 5000 GROUP BY 1) a
              FULL OUTER JOIN
                   (SELECT c_mktsegment, count(*) AS n_debt FROM customer
                    WHERE c_acctbal < 0 GROUP BY 1) b
              USING (c_mktsegment)
              ORDER BY c_mktsegment""")),

    // J6: vertical concat / batch union (AE_results.ipynb cell 15).
    QueryDef(
      "j6_union_all",
      (s, d) => {
        val o = T.orders(s, d)
        o.filter(col("o_totalprice") > 400000)
          .select(col("o_orderkey"), lit("high").as("bucket"))
          .unionByName(o.filter(col("o_totalprice") < 1000)
            .select(col("o_orderkey"), lit("low").as("bucket")))
          .orderBy("o_orderkey", "bucket")
      },
      Some("""SELECT o_orderkey, 'high' AS bucket FROM orders WHERE o_totalprice > 400000
              UNION ALL
              SELECT o_orderkey, 'low' AS bucket FROM orders WHERE o_totalprice < 1000
              ORDER BY o_orderkey, bucket""")),

    // J7: bucket-layout equi-join — both sides written bucketed+sorted on
    // the join key (etl/ScaleUtils.bucketedPair), so the join AND the
    // follow-up aggregation on that key run with ZERO hash exchanges (the
    // only exchange left is the presentation sort's range partitioning).
    // This is the 100 TB shape for repeated fact⋈dim joins: pay the
    // layout once, join shuffle-free forever after.
    QueryDef(
      "j7_bucketed_join",
      (s, d) => {
        import graft.etl.ScaleUtils
        val o = T.orders(s, d)
          .select(col("o_custkey").as("custkey"), col("o_totalprice"))
        val c = T.customer(s, d)
          .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
        // table names are namespaced per dataset path, so the layout is
        // written ONCE per dataset per JVM and reused by every later run
        // (pay the layout once — the steady-state query is write-free)
        val tag = ScaleUtils.pathTag(d)
        val (bo, bc) = ScaleUtils.bucketedPair(s, o, c, "custkey", 16,
          s"graft_j7_orders_$tag", s"graft_j7_customer_$tag")
        bo.hint("merge").join(bc, Seq("custkey"))
          .groupBy("custkey", "c_mktsegment")
          .agg(count(lit(1)).as("n_orders"),
            round(sum("o_totalprice"), 2).as("total"))
          .orderBy("custkey")
      },
      Some("""SELECT o_custkey AS custkey, c_mktsegment, count(*) AS n_orders,
                     round(sum(o_totalprice), 2) AS total
              FROM orders JOIN customer ON o_custkey = c_custkey
              GROUP BY 1, 2 ORDER BY custkey""")),

    // J8: multi-source JDBC roundtrip (north-star "JDBC reads/writes"):
    // `customer` is loaded ONCE per dataset per JVM into embedded Derby
    // (sources/Jdbc.ensureTable — pay-once, steady state is write-free),
    // read back as a PARTITIONED JDBC scan (one cursor per c_custkey
    // range slice — the shape that parallelizes across executors against
    // a real warehouse), filtered WITH PUSHDOWN into the remote WHERE
    // clause (PlanSpec guards `PushedFilters` on the JDBC scan), then
    // joined against the parquet `orders` fact — a genuine two-source
    // plan. Oracle: plain SQL over the same rows (the roundtrip must be
    // value-faithful, so parquet-sourced SQL is the same relation).
    QueryDef(
      "j8_jdbc_roundtrip",
      (s, d) => {
        import graft.etl.ScaleUtils
        import graft.sources.Jdbc
        val tag = ScaleUtils.pathTag(d)
        val c = T.customer(s, d)
          .select("c_custkey", "c_mktsegment", "c_acctbal")
        val (url, lo, hi) = Jdbc.ensureTable(c,
          s"${sys.props("java.io.tmpdir")}/graft_derby_$tag",
          "graft_customer", "c_custkey")
        val cust = Jdbc.read(s, url, "graft_customer", "c_custkey",
            lo, hi, numPartitions = 8)
          .filter(col("c_acctbal") > 0)
          .select("c_custkey", "c_mktsegment")
        T.orders(s, d)
          .select(col("o_custkey"), col("o_totalprice"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_orders"),
            round(sum("o_totalprice"), 2).as("total"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, count(*) AS n_orders,
                     round(sum(o_totalprice), 2) AS total
              FROM orders JOIN customer ON o_custkey = c_custkey
              WHERE c_acctbal > 0
              GROUP BY 1 ORDER BY 1""")),

    // ---- §2.4 deterministic splits (SP1/SP2 via W1/W2) ------------------
    // SP1: stratified 80/20 split, exact per-class counts, seeded
    // (TCGA_Auxiliary/Data_prep.py:16-58). Window over a seeded hash order:
    // scales to any class size without collecting keys to the driver.
    QueryDef(
      "sp1_stratified_split",
      (s, d) => {
        val w = Window.partitionBy("c_mktsegment")
          .orderBy(knuthHash(col("c_custkey"), 42), col("c_custkey"))
        val wc = Window.partitionBy("c_mktsegment")
        T.customer(s, d)
          .withColumn("rn", row_number().over(w))
          .withColumn("cnt", count(lit(1)).over(wc))
          .filter(col("rn") <= round(col("cnt") * 0.8))
          .select("c_custkey", "c_mktsegment")
          .orderBy("c_custkey")
      },
      Some(s"""SELECT c_custkey, c_mktsegment FROM (
                 SELECT c_custkey, c_mktsegment,
                        row_number() OVER (PARTITION BY c_mktsegment
                          ORDER BY ${knuthSql("c_custkey", 42)}, c_custkey) AS rn,
                        count(*) OVER (PARTITION BY c_mktsegment) AS cnt
                 FROM customer)
               WHERE rn <= round(cnt * 0.8)
               ORDER BY c_custkey""")),

    // SP2: k-fold assignment, k=5, seeded
    // (CNC_AE_model_selection.py:346-358). fold = seeded-hash(key) % 5:
    // embarrassingly parallel (pure per-row expression, no window, no
    // shuffle) — the global-ORDER-BY row_number formulation funnels every
    // row through ONE task at scale. Fold sizes are binomial around n/5
    // (exact-equality splits stay available via SP3's per-class window).
    QueryDef(
      "sp2_fold_assign",
      (s, d) => T.customer(s, d)
        .withColumn("fold", pmod(knuthHash(col("c_custkey"), 21), lit(5)))
        .select("c_custkey", "fold")
        .orderBy("c_custkey"),
      Some(s"""SELECT c_custkey,
                      CAST(${knuthSql("c_custkey", 21)} % 5 AS BIGINT) AS fold
               FROM customer ORDER BY c_custkey""")),

    // SP3: STRATIFIED k-fold — round-robin within each class over the
    // seeded order (Evaluation_Auxiliary/nb_classification.py:20).
    QueryDef(
      "sp3_stratified_fold",
      (s, d) => {
        val w = Window.partitionBy("c_mktsegment")
          .orderBy(knuthHash(col("c_custkey"), 21), col("c_custkey"))
        T.customer(s, d)
          .withColumn("fold", pmod(row_number().over(w) - 1, lit(5)))
          .groupBy("c_mktsegment", "fold")
          .agg(count(lit(1)).as("n"))
          .orderBy("c_mktsegment", "fold")
      },
      Some(s"""SELECT c_mktsegment, fold, count(*) AS n FROM (
                 SELECT c_mktsegment,
                        (row_number() OVER (PARTITION BY c_mktsegment
                           ORDER BY ${knuthSql("c_custkey", 21)}, c_custkey) - 1) % 5
                          AS fold
                 FROM customer)
               GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- §2.5 aggregations ----------------------------------------------
    // A1: per-group min/max fit + rescale (MinMaxScaler,
    // TCGA_Auxiliary/Data_prep.py:72-76). fit = groupBy(flag).agg(min,max)
    // (map-side combinable, ≤3 result rows) broadcast-joined back — a
    // window PARTITION BY a 3-value key would shuffle the whole table
    // into ≤3 partitions at scale. min/max are exact (no summation-order
    // drift), so the rescaled doubles hash-match.
    QueryDef(
      "a1_minmax_rescale",
      (s, d) => {
        val li = T.lineitem(s, d)
        val mm = li.groupBy("l_returnflag")
          .agg(min("l_extendedprice").as("mn"), max("l_extendedprice").as("mx"))
        li.join(broadcast(mm), Seq("l_returnflag"))
          .select(col("l_orderkey"), col("l_linenumber"),
            round((col("l_extendedprice") - col("mn")) / (col("mx") - col("mn")), 6)
              .as("scaled"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber,
                     round((l_extendedprice - min(l_extendedprice) OVER w)
                         / (max(l_extendedprice) OVER w - min(l_extendedprice) OVER w), 6)
                       AS scaled
              FROM lineitem WINDOW w AS (PARTITION BY l_returnflag)
              ORDER BY l_orderkey, l_linenumber""")),

    // A2: per-class counts (Data_prep.py:40-52).
    QueryDef(
      "a2_group_count",
      (s, d) => T.customer(s, d).groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"))
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, count(*) AS n FROM customer
              GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // A3: mean/std over grouped values — NumPy std is population std
    // (AE_results.ipynb cells 26/28/38) → stddev_pop, not stddev_samp.
    QueryDef(
      "a3_mean_std",
      (s, d) => T.lineitem(s, d).groupBy("l_returnflag")
        .agg(round(avg("l_quantity"), 4).as("mean_qty"),
          round(stddev_pop("l_quantity"), 4).as("std_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, round(avg(l_quantity), 4) AS mean_qty,
                     round(stddev_pop(l_quantity), 4) AS std_qty, count(*) AS n
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // A4: row-wise mean of k columns (AE_results.ipynb cell 57).
    QueryDef(
      "a4_row_mean",
      (s, d) => T.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          round((col("l_discount") + col("l_tax")) / 2, 6).as("row_mean"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
                     round((l_discount + l_tax) / 2, 6) AS row_mean
              FROM lineitem ORDER BY l_orderkey, l_linenumber""")),

    // A5+W3+O2: best row per group by metric — row_number over ordered
    // window = 1 (AE_results.ipynb cells 50/57). Cheapest supplier/nation.
    QueryDef(
      "a5_best_per_group",
      (s, d) => {
        val w = Window.partitionBy("s_nationkey")
          .orderBy(col("s_acctbal"), col("s_suppkey"))
        T.supplier(s, d)
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select("s_nationkey", "s_suppkey", "s_acctbal")
          .orderBy("s_nationkey")
      },
      Some("""SELECT s_nationkey, s_suppkey, s_acctbal FROM (
                SELECT s_nationkey, s_suppkey, s_acctbal,
                       row_number() OVER (PARTITION BY s_nationkey
                         ORDER BY s_acctbal, s_suppkey) AS rk
                FROM supplier)
              WHERE rk = 1 ORDER BY s_nationkey""")),

    // A6: contingency table (confusion-matrix analog,
    // Simulation_Auxiliary/evaluation.py:44).
    QueryDef(
      "a6_contingency",
      (s, d) => T.orders(s, d)
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("o_orderstatus", "o_orderpriority"),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
              FROM orders GROUP BY 1, 2 ORDER BY 1, 2""")),

    // A6-pivot: contingency in matrix layout. Conditional aggregation keeps
    // column names oracle-stable (vs. value-derived pivot names).
    QueryDef(
      "a6_pivot",
      (s, d) => T.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          count(when(col("o_orderpriority") === "1-URGENT", 1)).as("urgent"),
          count(when(col("o_orderpriority") === "2-HIGH", 1)).as("high"),
          count(when(col("o_orderpriority") === "3-MEDIUM", 1)).as("medium"),
          count(when(col("o_orderpriority") === "4-NOT SPECIFIED", 1)).as("notspec"),
          count(when(col("o_orderpriority") === "5-LOW", 1)).as("low"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus,
                     count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent,
                     count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS high,
                     count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS medium,
                     count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS notspec,
                     count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS low
              FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // A16: grouped JSON-key aggregation — the reference's per-model
    // JSON result dictionaries (map key → loss array, AE_results.ipynb
    // cell 28) aggregated as mean/std(pop) per TRUNCATED key
    // ('_'.join(key.split('_')[:1]), the cell-28 idiom). The query
    // renders the reference-shaped JSON file from `supplier` (key =
    // grp<nation>_rep<suppkey%2>, values sorted for determinism; built
    // with to_json(map_from_entries(...)) — no driver-side loop), reads
    // it back through the S11 multiLine JSON scan + stack unpivot
    // (ResultTables.readResultJson), truncates, and aggregates. Oracle:
    // the same mean/std over the parquet rows (j8 recipe).
    QueryDef(
      "a16_result_agg",
      (s, d) => {
        import graft.pipeline.ResultTables
        val dir = s"${sys.props("java.io.tmpdir")}/graft_a16_" +
          graft.etl.ScaleUtils.pathTag(d)
        T.supplier(s, d)
          .select(concat(lit("grp"), col("s_nationkey"), lit("_rep"),
            pmod(col("s_suppkey"), lit(2))).as("key"),
            col("s_acctbal").as("v"))
          .groupBy("key").agg(sort_array(collect_list("v")).as("vals"))
          .agg(to_json(map_from_entries(sort_array(
            collect_list(struct(col("key"), col("vals")))))).as("j"))
          .coalesce(1).write.mode("overwrite").text(dir)
        ResultTables.meanStdByKey(
            ResultTables.readResultJson(s, dir), keyParts = 1)
          .select(col("key"), round(col("mean"), 4).as("mean"),
            round(col("std"), 4).as("std"), col("n"))
          .orderBy("key")
      },
      Some("""SELECT 'grp' || s_nationkey AS key,
                     round(avg(s_acctbal), 4) AS mean,
                     round(stddev_pop(s_acctbal), 4) AS std,
                     count(*) AS n
              FROM supplier GROUP BY 1 ORDER BY key""")),

    // A8: accuracy as conditional mean (evaluation.py:11).
    QueryDef(
      "a8_accuracy",
      (s, d) => T.lineitem(s, d)
        .agg(round(avg(when(col("l_returnflag") === "R", 1.0).otherwise(0.0)), 6)
          .as("frac_returned")),
      Some("""SELECT round(avg(CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END), 6)
                     AS frac_returned FROM lineitem""")),

    // A9: Frobenius-norm-style aggregate sqrt(Σ(x−y)²)
    // (CNC_AE_model_selection.py:209-229).
    QueryDef(
      "a9_frobenius",
      (s, d) => T.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(round(sqrt(sum(pow(col("l_discount") - col("l_tax"), 2))), 4)
          .as("frob"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
                     round(sqrt(sum(pow(l_discount - l_tax, 2))), 4) AS frob
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // A10: per-subject L2 norm, one row per key
    // (reconloss_from_retrained_models.py:45,69-72).
    QueryDef(
      "a10_row_l2",
      (s, d) => T.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(round(sqrt(sum(pow(col("l_discount") - col("l_tax"), 2))), 6)
          .as("l2"))
        .orderBy("l_orderkey"),
      Some("""SELECT l_orderkey,
                     round(sqrt(sum(pow(l_discount - l_tax, 2))), 6) AS l2
              FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""")),

    // ---- §2.6 window computations ---------------------------------------
    // W4: partitioned sum over contingency counts — the Hungarian cost
    // matrix input colsum(C[:,j]) − C[i,j] (evaluation.py:15-23).
    QueryDef(
      "w4_hungarian_cost",
      (s, d) => {
        val cont = T.orders(s, d)
          .groupBy("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("cnt"))
        cont.withColumn("cost",
            sum("cnt").over(Window.partitionBy("o_orderpriority")) - col("cnt"))
          .select("o_orderstatus", "o_orderpriority", "cost")
          .orderBy("o_orderstatus", "o_orderpriority")
      },
      // DuckDB sums integers into HUGEINT; cast back to BIGINT so the
      // hash matches Spark's LongType.
      Some("""SELECT o_orderstatus, o_orderpriority,
                     CAST(sum(cnt) OVER (PARTITION BY o_orderpriority) - cnt
                          AS BIGINT) AS cost
              FROM (SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
                    FROM orders GROUP BY 1, 2)
              ORDER BY o_orderstatus, o_orderpriority""")),

    // ---- §2.7 sorts / limits --------------------------------------------
    // O1: global sort + take-1 → TakeOrderedAndProject, no full sort at
    // scale (AE_results.ipynb cell 50).
    QueryDef(
      "o1_top1",
      (s, d) => T.orders(s, d)
        .orderBy(col("o_totalprice"), col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(1),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
              ORDER BY o_totalprice, o_orderkey LIMIT 1""")),

    // O1b: top-k variant (k=10) for the same physical path.
    QueryDef(
      "o1_topk",
      (s, d) => T.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")),

    // ---- §2.8 scalar functions ------------------------------------------
    // F2: label prefix extraction — split()[0]
    // (CNC_AE_model_selection.py:514). Spark split is regex; space literal.
    QueryDef(
      "f2_split_prefix",
      (s, d) => T.part(s, d)
        .select(element_at(split(col("p_name"), " "), 1).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
        .orderBy("word"),
      Some("""SELECT string_split(p_name, ' ')[1] AS word, count(*) AS n
              FROM part GROUP BY 1 ORDER BY word""")),

    // F3: string→int label map, fixed dict order (Data_prep.py:86-89).
    QueryDef(
      "f3_label_map",
      (s, d) => T.customer(s, d)
        .withColumn("seg_code",
          when(col("c_mktsegment") === "AUTOMOBILE", 0)
            .when(col("c_mktsegment") === "BUILDING", 1)
            .when(col("c_mktsegment") === "FURNITURE", 2)
            .when(col("c_mktsegment") === "HOUSEHOLD", 3)
            .when(col("c_mktsegment") === "MACHINERY", 4)
            .otherwise(-1))
        .select("c_custkey", "seg_code")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
                     CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 0 WHEN 'BUILDING' THEN 1
                          WHEN 'FURNITURE' THEN 2 WHEN 'HOUSEHOLD' THEN 3
                          WHEN 'MACHINERY' THEN 4 ELSE -1 END AS seg_code
              FROM customer ORDER BY c_custkey""")),

    // F4: prefix strip via regexp_replace (tsn_visulization.py:21).
    QueryDef(
      "f4_regexp_strip",
      (s, d) => T.orders(s, d)
        .select(regexp_replace(col("o_orderpriority"), "^[0-9]-", "").as("prio"))
        .groupBy("prio").agg(count(lit(1)).as("n"))
        .orderBy("prio"),
      Some("""SELECT regexp_replace(o_orderpriority, '^[0-9]-', '') AS prio,
                     count(*) AS n
              FROM orders GROUP BY 1 ORDER BY prio""")),

    // F5: key truncation '_'.join(split[:2]) (AE_results.ipynb cell 28).
    QueryDef(
      "f5_key_trunc",
      (s, d) => T.part(s, d)
        .select(col("p_partkey"),
          concat_ws("_", slice(split(col("p_name"), " "), 1, 2)).as("key2"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
                     array_to_string(list_slice(string_split(p_name, ' '), 1, 2), '_')
                       AS key2
              FROM part ORDER BY p_partkey""")),

    // F6: piecewise cell formatting (format_cell, AE_results.ipynb cell
    // 11) driven over real aggregates — sums hit the %.0f branch, the
    // exact min/max discounts (0.0 / 0.1 doubles) hit the sentinel
    // branches, the scaled-down average hits %.7f, the average %.4f.
    QueryDef(
      "f6_format_cell",
      (s, d) => T.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(sum("l_quantity").as("sq"),
          round(avg("l_discount"), 6).as("ad"),
          min("l_discount").as("mind"),
          max("l_discount").as("maxd"),
          (round(avg("l_discount"), 6) / 10000).as("tiny"))
        .select(col("l_returnflag"),
          expr("stack(5, 'sum_qty', sq, 'avg_disc', ad, 'min_disc', mind, " +
            "'max_disc', maxd, 'tiny', tiny) AS (metric, value)"))
        .select(col("l_returnflag"), col("metric"),
          formatCell(col("value")).as("fmt"))
        .orderBy("l_returnflag", "metric"),
      Some("""WITH agg AS (
                SELECT l_returnflag,
                       CAST(sum(l_quantity) AS DOUBLE) AS sq,
                       round(avg(l_discount), 6) AS ad,
                       min(l_discount) AS mind,
                       max(l_discount) AS maxd,
                       round(avg(l_discount), 6) / 10000 AS tiny
                FROM lineitem GROUP BY 1),
              u AS (
                SELECT l_returnflag, 'sum_qty' AS metric, sq AS value FROM agg
                UNION ALL SELECT l_returnflag, 'avg_disc', ad FROM agg
                UNION ALL SELECT l_returnflag, 'min_disc', mind FROM agg
                UNION ALL SELECT l_returnflag, 'max_disc', maxd FROM agg
                UNION ALL SELECT l_returnflag, 'tiny', tiny FROM agg)
              SELECT l_returnflag, metric,
                     CASE WHEN isnan(value) THEN 'NA'
                          WHEN value >= 1 THEN printf('%.0f', value)
                          WHEN value = 0 THEN '0'
                          WHEN value = 0.1 THEN '0.1'
                          WHEN value = 0.01 THEN '0.01'
                          WHEN value = 0.2 THEN '0.2'
                          WHEN value = 0.4 THEN '0.4'
                          WHEN value = 0.6 THEN '0.6'
                          WHEN value < 0.0001 THEN printf('%.7f', value)
                          ELSE printf('%.4f', value) END AS fmt
              FROM u ORDER BY l_returnflag, metric""")),

    // F9: float32 cast (CNC_AE_model_selection.py:247-248
    // `type(torch.float32)`). The engine computes in Double (SURVEY §2.8
    // F9 documents the tolerance); this query pins the cast ITSELF: the
    // double→float32→double round-trip is IEEE-754 round-to-nearest in
    // both engines, so values must match BIT-exactly — no rounding on
    // either side. Also emits the round-trip error scaled to ULP-ish
    // magnitude so the hash sees the precision loss, not just the value.
    QueryDef(
      "f9_float32_cast",
      (s, d) => T.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice").cast("float").cast("double").as("price_f32"),
          round((col("l_extendedprice") -
            col("l_extendedprice").cast("float").cast("double")) * 1e6, 6)
            .as("err_ppm"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
                     CAST(CAST(l_extendedprice AS REAL) AS DOUBLE) AS price_f32,
                     round((l_extendedprice -
                            CAST(CAST(l_extendedprice AS REAL) AS DOUBLE)) * 1e6, 6)
                       AS err_ppm
              FROM lineitem ORDER BY l_orderkey, l_linenumber""")),

    // F10: unpivot / pivot_longer (AE_results.ipynb cell 130). Spark-side
    // stack() of per-flag aggregates; DuckDB-side UNION ALL.
    QueryDef(
      "f10_unpivot",
      (s, d) => T.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"))
        .select(col("l_returnflag"),
          expr("stack(2, 'sum_qty', sum_qty, 'sum_price', sum_price) AS (metric, value)"))
        .orderBy("l_returnflag", "metric"),
      Some("""WITH agg AS (
                SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
                       round(sum(l_extendedprice), 2) AS sum_price
                FROM lineitem GROUP BY 1)
              SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM agg
              UNION ALL
              SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM agg
              ORDER BY l_returnflag, metric"""))
  )
}
