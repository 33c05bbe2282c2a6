package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScaleUtilsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  describe("saltedSumCount (skewed groupBy)") {
    it("is exact vs the direct aggregation") {
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
      val direct = li.groupBy("l_returnflag")
        .agg(sum("l_quantity").as("sum_l_quantity"), count(lit(1)).as("cnt"))
        .collect().map(r => r.getString(0) ->
          (r.getDouble(1), r.getLong(2))).toMap
      val salted = ScaleUtils
        .saltedSumCount(li, Seq("l_returnflag"), "l_quantity")
        .collect().map(r => r.getString(0) ->
          (r.getDouble(1), r.getLong(2))).toMap
      assert(salted.keySet == direct.keySet)
      salted.foreach { case (k, (s, c)) =>
        assert(math.abs(s - direct(k)._1) < 1e-6 && c == direct(k)._2)
      }
    }
  }

  describe("bucketedPair (shuffle-free equi-join)") {
    it("joins bucketed tables without an Exchange") {
      val o = spark.read.parquet(s"$sf/orders.parquet")
        .select("o_orderkey", "o_totalprice")
      val l = spark.read.parquet(s"$sf/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
        .withColumnRenamed("l_orderkey", "o_orderkey")
      val (bo, bl) = ScaleUtils.bucketedPair(spark, o, l,
        "o_orderkey", buckets = 4, "t_orders_b", "t_lineitem_b")
      // disable broadcast so the join strategy is the bucket-aware SMJ
      val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = bo.join(bl, "o_orderkey")
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), plan)
        assert(!plan.contains("Exchange"), plan)
        assert(joined.count() ==
          o.join(l, "o_orderkey").count())
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      }
    }

    it("reuses an existing layout instead of rewriting (pay-once)") {
      val o = spark.read.parquet(s"$sf/orders.parquet")
        .select("o_orderkey", "o_totalprice")
      val l = spark.read.parquet(s"$sf/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
        .withColumnRenamed("l_orderkey", "o_orderkey")
      def files(name: String): Set[String] = {
        val d = new java.io.File(spark.conf
          .get("spark.sql.warehouse.dir").stripPrefix("file:"), name)
        Option(d.listFiles()).fold(Set.empty[String])(
          _.map(f => s"${f.getName}:${f.length}").toSet)
      }
      ScaleUtils.bucketedPair(spark, o, l, "o_orderkey", 4,
        "t_orders_r", "t_lineitem_r")
      val before = files("t_orders_r") -> files("t_lineitem_r")
      // second call must be write-free: same part files, same sizes
      ScaleUtils.bucketedPair(spark, o, l, "o_orderkey", 4,
        "t_orders_r", "t_lineitem_r")
      assert(files("t_orders_r") -> files("t_lineitem_r") == before,
        "bucketed layout was rewritten on reuse")
    }
  }

  describe("dataTag (content-keyed persistence tag)") {
    it("is stable across reads but changes when the data is rewritten") {
      val dir = java.nio.file.Files.createTempDirectory("graft_datatag")
      val f = new java.io.File(dir.toFile, "part-0")
      java.nio.file.Files.write(f.toPath, "v1".getBytes)
      val t1 = ScaleUtils.dataTag(dir.toString)
      assert(ScaleUtils.dataTag(dir.toString) == t1, "tag not stable")
      // same length, later mtime — the staleness class pathTag misses:
      // a blow-up probe rewriting the same /tmp corpus path in place
      Thread.sleep(5)
      java.nio.file.Files.write(f.toPath, "v2".getBytes)
      f.setLastModified(f.lastModified() + 1000)
      assert(ScaleUtils.dataTag(dir.toString) != t1,
        "rewritten data kept the old tag — persisted models would go stale")
      // different paths never collide on tag (path is part of the sig)
      val dir2 = java.nio.file.Files.createTempDirectory("graft_datatag")
      java.nio.file.Files.write(
        new java.io.File(dir2.toFile, "part-0").toPath, "v1".getBytes)
      assert(ScaleUtils.dataTag(dir2.toString) != t1)
      def rm(x: java.io.File): Unit = if (x.exists()) {
        if (x.isDirectory) Option(x.listFiles()).foreach(_.foreach(rm))
        x.delete()
      }
      rm(dir.toFile); rm(dir2.toFile)
    }
  }
}
