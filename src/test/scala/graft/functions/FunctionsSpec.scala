package graft.functions

import graft.SparkSpec
import graft.sources.Jdbc
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {

  describe("CosineSimilarity native expression") {
    it("matches the HOF implementation on the embeddings table") {
      CosineSimilarity.register(spark)
      val e = spark.read
        .parquet("/root/testdata/sf0.001/embeddings.parquet")
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
      val joined = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      val native = joined.selectExpr("vec_id",
          "round(graft_cosine(embedding, qe), 9) AS c")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val hof = joined.select(col("vec_id"),
          round(graft.operators.SimilarityOps.cosine(
            col("embedding"), col("qe")), 9).as("c"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(native == hof)
    }

    it("survives whole-stage codegen and interpreted paths identically") {
      CosineSimilarity.register(spark)
      import spark.implicits._
      val df = Seq((Seq(1.0, 2.0, 3.0), Seq(3.0, 2.0, 1.0)))
        .toDF("a", "b")
      val v = df.selectExpr("graft_cosine(a, b)").head().getDouble(0)
      val expected = 10.0 / (math.sqrt(14.0) * math.sqrt(14.0))
      assert(math.abs(v - expected) < 1e-12)
    }
  }

  describe("LshSignBits native expression") {
    it("matches the HOF reference bucket bit-for-bit (all y4 seeds)") {
      import graft.operators.SimilarityOps
      val e = spark.read
        .parquet("/root/testdata/sf0.001/embeddings.parquet")
      for (seed <- Seq(42L, 137L, 271L, 613L); nBits <- Seq(4, 8, 12)) {
        val mismatches = e.select(
            SimilarityOps.lshBucket(col("embedding"), nBits, 64, seed)
              .as("ref"),
            SimilarityOps.lshBucketFast(col("embedding"), nBits, 64, seed)
              .as("fast"))
          .filter(col("ref") =!= col("fast")).count()
        assert(mismatches == 0,
          s"literal-plane bucket diverged at seed=$seed nBits=$nBits")
      }
    }

    it("survives interpreted (non-codegen) evaluation identically") {
      import graft.operators.SimilarityOps
      import spark.implicits._
      val df = Seq(Seq(0.5f, -1.0f, 2.0f, 0.0f)).toDF("v")
      val planes = SimilarityOps.planeMatrix(6, 4, 42L)
      val viaCol = df.select(
        graft.functions.LshSignBits.lsh_sign_bits(col("v"), planes).as("b"))
        .head().getLong(0)
      // interpreted path: eval through a fresh expression on a local row
      val expected = (0 until 6).map { b =>
        val dot = (0 until 4).map(i =>
          Seq(0.5, -1.0, 2.0, 0.0)(i) * planes(b)(i)).sum
        if (dot >= 0) 1L << b else 0L
      }.sum
      assert(viaCol == expected)
    }

    it("rejects array<decimal> at analysis time (no silent getByte path)") {
      import graft.operators.SimilarityOps
      import spark.implicits._
      val df = Seq(Seq(BigDecimal(1.5), BigDecimal(-2.5))).toDF("v")
      val planes = SimilarityOps.planeMatrix(4, 2, 42L)
      val err = intercept[org.apache.spark.sql.AnalysisException] {
        df.select(graft.functions.LshSignBits.lsh_sign_bits(col("v"), planes))
          .collect()
      }
      assert(err.getMessage.toLowerCase.contains("lsh_sign_bits"))
    }
  }

  describe("formatCell (F6 — format_cell, AE_results.ipynb cell 11)") {
    it("matches the reference's piecewise formatting on every branch") {
      import graft.operators.RelationalOps
      import spark.implicits._
      val cases = Seq(
        500.0 -> "500",          // >= 1 → %.0f
        1.0 -> "1",
        0.0 -> "0",              // exact-zero sentinel
        0.1 -> "0.1",            // sentinel equalities
        0.01 -> "0.01",
        0.2 -> "0.2", 0.4 -> "0.4", 0.6 -> "0.6",
        0.00005 -> "0.0000500",  // < 1e-4 → %.7f
        -3.5 -> "-3.5000000",    // negative falls to < 1e-4 like the Python
        0.05 -> "0.0500",        // else → %.4f
        0.12345678 -> "0.1235",
        Double.NaN -> "NA")      // NaN first — Spark orders NaN above all
      val got = cases.map(_._1).toDF("v")
        .select(RelationalOps.formatCell(col("v")).as("f"))
        .collect().map(_.getString(0)).toSeq
      assert(got == cases.map(_._2))
    }
  }

  describe("SimHash64 native expression") {
    it("matches the SQL HOF reference fingerprint bit-for-bit") {
      import graft.operators.TextOps
      val hs = spark.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("doc_id"),
          transform(split(trim(col("text")), "\\s+"),
            t => xxhash64(t)).as("hs"))
      val mismatches = hs.select(
          expr(TextOps.simhashSqlOverHs).as("ref"),
          SimHash64.simhash64(col("hs")).as("fast"))
        .filter(col("ref") =!= col("fast")).count()
      assert(mismatches == 0)
    }
  }

  describe("NearestCentroid native expression") {
    it("matches the interpreted HOF argmin bit-for-bit on the corpus") {
      import graft.operators.SimilarityOps
      // a real (seeded, deterministic) centroid matrix over the real
      // float corpus — covers float→double casts and near-tie geometry
      val cents = SimilarityOps.ivfCentroids(spark, "/root/testdata/sf0.001")
      val e = spark.read
        .parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("features"))
      val mismatches = e.select(
          SimilarityOps.ivfCellExpr(col("features"), cents).as("fast"),
          SimilarityOps.ivfCellExprRef(col("features"), cents).as("ref"))
        .filter(col("fast") =!= col("ref")).count()
      assert(mismatches == 0)
    }

    it("breaks exact distance ties toward the lowest centroid index") {
      import spark.implicits._
      val cents = Seq(Seq(1.0, 0.0), Seq(1.0, 0.0), Seq(0.0, 0.0))
      // (1,0): exact tie between c0 and c1 -> lowest index 0
      // (0.1,0): c2 at the origin is strictly nearest -> 2
      val got = Seq(Seq(1.0, 0.0), Seq(0.1, 0.0)).toDF("v")
        .select(NearestCentroid.nearest_centroid(col("v"), cents).as("c"))
        .collect().map(_.getLong(0)).toSeq
      assert(got == Seq(0L, 2L))
    }

    it("fails loudly on a vector/centroid dimension mismatch") {
      // silently zero-padding short vectors (the old behavior) would
      // diverge from the literal-replay oracle with no error — a mixed
      // or truncated embedding table must be a hard failure (ADVICE r6)
      import spark.implicits._
      val cents = Seq(Seq(0.0, 5.0), Seq(0.0, 0.1))
      val err = intercept[Exception] {
        Seq(Seq(0.0)).toDF("v")
          .select(NearestCentroid.nearest_centroid(col("v"), cents).as("c"))
          .collect()
      }
      def rootMsg(t: Throwable): String =
        (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(e => Option(e.getMessage).getOrElse("")).mkString(" | "))
      assert(rootMsg(err).contains("1 dims, centroids have 2"), rootMsg(err))
      // matching dims still evaluate
      val ok = Seq(Seq(0.0, 0.2)).toDF("v")
        .select(NearestCentroid.nearest_centroid(col("v"), cents).as("c"))
        .collect().map(_.getLong(0)).toSeq
      assert(ok == Seq(1L))
    }
  }

  describe("SpanHash native expression") {
    it("matches the Scala reference windows on the documents corpus") {
      val ht = spark.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("doc_id"),
          transform(split(trim(col("text")), "\\s+"),
            t => pmod(PolyHash64.polyhash64(t), lit(1000000007L))).as("ht"))
      val got = ht.select(col("doc_id"),
          SpanHash.spanHash(col("ht"), 10).as("hs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val ref = ht.collect().map(r =>
        r.getLong(0) -> SpanHash.spans(r.getSeq[Long](1).toArray, 10).toSeq)
      ref.foreach { case (id, want) => assert(got(id) == want, s"doc $id") }
      assert(ref.exists(_._2.length > 1), "corpus should yield real windows")
    }

    it("survives codegen on edge widths (short docs, n=1, single token)") {
      import spark.implicits._
      val inputs: Seq[Seq[Long]] = Seq(Seq(7L), Seq(1L, 2L, 3L), Seq(5L, 6L))
      for (n <- Seq(1, 2, 3, 10)) {
        val got = inputs.toDF("ht")
          .select(SpanHash.spanHash(col("ht"), n).as("hs"))
          .collect().map(_.getSeq[Long](0).toSeq)
        val want = inputs.map(h => SpanHash.spans(h.toArray, n).toSeq)
        assert(got.toSeq == want, s"n=$n")
      }
    }
  }

  describe("RollingFingerprint native expression (x9)") {
    it("matches the HOF char-fold formulation on the documents corpus") {
      // the formulation x9 shipped through r10: split-into-chars +
      // interpreted lambda fold (kept here as the independent reference)
      val docs = spark.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
      val hof = docs.select(col("doc_id"),
          aggregate(
            transform(filter(split(col("text"), ""), c => c =!= ""),
              c => ascii(c).cast("long")),
            lit(0L),
            (acc, c) => pmod(acc * lit(257L) + c, lit(1000000007L)))
            .as("fp"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val native = docs.select(col("doc_id"),
          RollingFingerprint.fingerprint(col("text")).as("fp"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(native == hof)
    }

    it("survives codegen on edge inputs and folds CODE POINTS") {
      import spark.implicits._
      val inputs = Seq("", "a", "ab", "héllo", "日本語", "😀x")
      val got = inputs.toDF("s")
        .select(RollingFingerprint.fingerprint(col("s")).as("fp"))
        .collect().map(_.getLong(0))
      def ref(s: String): Long = {
        var acc = 0L
        s.codePoints().forEach(cp =>
          acc = (acc * RollingFingerprint.B + cp) % RollingFingerprint.P)
        acc
      }
      assert(got.toSeq == inputs.map(ref))
      // supplementary plane: ONE code point (DuckDB unicode() parity),
      // not two surrogate code units
      assert(ref("😀x") ==
        ((0x1F600L * 257 + 'x') % RollingFingerprint.P))
    }
  }

  describe("BpePieceCount native expression (x12)") {
    it("matches size(regexp_extract_all) on the documents corpus") {
      // the regex formulation x12 shipped through r12, kept as the
      // independent reference (and still the DuckDB oracle's side)
      val docs = spark.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
      val rx = docs.select(col("doc_id"),
          size(regexp_extract_all(col("text"),
            lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).as("n"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val native = docs.select(col("doc_id"),
          BpePieceCount.pieces(col("text")).as("n"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(native == rx)
    }

    it("survives codegen and matches java.util.regex on edge inputs") {
      import spark.implicits._
      val inputs = Seq("", "a", "aA9", "a1b", "3.14", "a-b  c",
        "héllo wörld", "日本語テスト", "😀x 😀😀", "\tmixed\n42cats!!",
        "~salt~123", "   ", "...", "ab")
      val got = inputs.toDF("s")
        .select(BpePieceCount.pieces(col("s")).as("n"))
        .collect().map(_.getInt(0))
      val p = java.util.regex.Pattern
        .compile("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")
      def ref(s: String): Int = {
        val m = p.matcher(s); var n = 0
        while (m.find()) n += 1
        n
      }
      assert(got.toSeq == inputs.map(ref),
        inputs.map(s => s"$s -> ref=${ref(s)}").mkString("; "))
      // supplementary plane: one piece per CODE POINT, not per UTF-16
      // unit — "😀x 😀😀" is other, letter, other, other = 4
      assert(ref("😀x 😀😀") == 4)
    }

    it("fuzz: matches java.util.regex on arbitrary UTF-8 " +
        "(1500 generated cases incl. supplementary planes and \\x0B)") {
      // VERDICT r12 ask #6: the byte-classification pass must never
      // silently diverge from java.util.regex semantics on inputs
      // nobody hand-picked. Weighted unit mix stresses the state
      // machine's transitions: letter/digit runs, ASCII symbols, the
      // full Java \s class (incl. \x0B, which RE2 lacks — the pinned
      // contract here is Spark's own java.util.regex), non-ASCII BMP,
      // supplementary planes, and C0 controls.
      import org.scalacheck.Gen
      import org.scalacheck.rng.Seed
      val unit: Gen[String] = Gen.frequency(
        5 -> Gen.choose(1, 6).flatMap(n =>
          Gen.stringOfN(n, Gen.alphaChar)),
        4 -> Gen.choose(1, 5).flatMap(n =>
          Gen.stringOfN(n, Gen.numChar)),
        4 -> Gen.oneOf(" ", "\t", "\n", "\u000B", "\f", "\r"),
        3 -> Gen.oneOf("!@#$%^&*()-_=+[]{};:'\",.<>/?\\|`~".toSeq)
          .map(_.toString),
        2 -> Gen.choose(0x80, 0xD7FF).map(_.toChar.toString),
        1 -> Gen.choose(0xE000, 0xFFFD).map(_.toChar.toString),
        1 -> Gen.choose(0x10000, 0x10FFFF)
          .map(cp => new String(Character.toChars(cp))),
        1 -> Gen.choose(0x00, 0x1F).map(_.toChar.toString))
      val strGen: Gen[String] = Gen.choose(0, 40)
        .flatMap(n => Gen.listOfN(n, unit)).map(_.mkString)
      val P = Gen.Parameters.default
      val cases = (1 to 1500).map(i =>
        strGen.pureApply(P, Seed(0xB9E5EED + i.toLong)))
      val p = java.util.regex.Pattern
        .compile("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")
      def ref(s: String): Int = {
        val m = p.matcher(s); var n = 0
        while (m.find()) n += 1
        n
      }
      // driver-side: the shared byte-pass kernel vs java.util.regex
      cases.foreach { s =>
        val got = BpePieceCount.count(
          s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        assert(got == ref(s),
          s"native=$got regex=${ref(s)} on ${s.map(c => f"\\u${c.toInt}%04x").mkString}")
      }
      // engine-side: one Spark job pushes every case through BOTH the
      // codegen'd expression and Spark's own regexp_extract_all
      import spark.implicits._
      val diverged = cases.toDF("s")
        .select(BpePieceCount.pieces(col("s")).as("native"),
          size(regexp_extract_all(col("s"),
            lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).as("rx"))
        .filter(col("native") =!= col("rx")).count()
      assert(diverged == 0L)
    }
  }

  describe("PolyHash64 native expression") {
    it("matches the Scala reference fold on the documents corpus") {
      val docs = spark.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
      val got = docs.select(col("doc_id"),
          PolyHash64.polyhash64(col("text")).as("h"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val texts = docs.select("doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(1))
      texts.foreach { case (id, t) =>
        assert(got(id) == PolyHash64.hash(t), s"doc $id")
      }
    }

    it("survives codegen on edge inputs (empty, 1-char, supplementary)") {
      import spark.implicits._
      val inputs = Seq("", "a", "ab", "a b", "😀x")
      val got = inputs.toDF("s")
        .select(PolyHash64.polyhash64(col("s")).as("h"))
        .collect().map(_.getLong(0))
      assert(got.toSeq == inputs.map(PolyHash64.hash))
      // codepoint fold: the emoji counts as ONE codepoint (0x1F600)
      val viaCp = {
        val m = PolyHash64.M
        ((m * m + 0x1F600L) * m + 'x'.toLong) * m
      }
      assert(PolyHash64.hash("😀x") == viaCp)
    }
  }

  describe("Jdbc source/sink (embedded Derby)") {
    it("writes customers to Derby and reads them back partitioned") {
      val dir = java.nio.file.Files.createTempDirectory("graft-derby")
        .resolve("db").toString
      val url = Jdbc.derbyUrl(dir)
      val customers = spark.read
        .parquet("/root/testdata/sf0.001/customer.parquet")
        .select("c_custkey", "c_name", "c_acctbal")
      Jdbc.write(customers, url, "customers")
      val back = Jdbc.read(spark, url, "customers", "c_custkey",
        0, 2000, numPartitions = 4)
      assert(back.rdd.getNumPartitions == 4)
      assert(back.count() == customers.count())
      val a = customers.orderBy("c_custkey").collect().map(_.toSeq)
      val b = back.orderBy("c_custkey").collect().map(_.toSeq)
      assert(a.sameElements(b))
      // pushdown reaches the JDBC source
      val filtered = Jdbc.readAll(spark, url, "customers")
        .filter(col("c_acctbal") > 5000)
      assert(filtered.count() ==
        customers.filter(col("c_acctbal") > 5000).count())
    }

    it("streams windowed counts into Derby idempotently (foreachBatch upsert)") {
      val sf = "/root/testdata/sf0.001"
      val dir = java.nio.file.Files.createTempDirectory("graft-derby-fb")
        .resolve("db").toString
      import graft.streaming.EventStream
      // what the append stream emits: windows closed by the watermark
      val expected = EventStream
        .runWindowedAppendOnce(spark, sf, "t_fb_expected")
        .select(col("window.start").as("ws"), col("event_type"),
          col("n"), round(col("total_value"), 4).as("total_value"))
      val once = EventStream.runWindowedToJdbcOnce(spark, sf, dir,
        queryName = "t_fb_1")
      assert(once.count() == expected.count())
      // a full REPLAY of the stream (fresh query, same data — the
      // at-least-once worst case) must leave the table unchanged:
      // the key-upsert makes table state exactly-once
      val twice = EventStream.runWindowedToJdbcOnce(spark, sf, dir,
        queryName = "t_fb_2")
      assert(twice.count() == expected.count(),
        "replayed stream duplicated rows in the JDBC sink")
      assert(twice.except(expected).count() == 0)
      assert(expected.except(twice).count() == 0)
    }

    it("rejects identifiers that would be unsafe to interpolate into MERGE") {
      import spark.implicits._
      val df = Seq((1L, "a")).toDF("k", "v\"bad")
      val e = intercept[IllegalArgumentException] {
        Jdbc.upsertBatch(df, "jdbc:derby:memory:unused;create=true",
          "t_ok", Seq("k"))
      }
      assert(e.getMessage.contains("interpolated"))
      val e2 = intercept[IllegalArgumentException] {
        Jdbc.upsertBatch(Seq((1L, "a")).toDF("k", "v"),
          "jdbc:derby:memory:unused;create=true", "bad-table", Seq("k"))
      }
      assert(e2.getMessage.contains("interpolated"))
    }
  }

  describe("BloomMightContain native expression (BlockedBloom)") {
    it("has zero false negatives and a bounded false-positive rate") {
      import spark.implicits._
      // 10k member keys, 100k disjoint probe keys (spread so the probe
      // range never overlaps the member range)
      val members = (0L until 10000L).map(_ * 2L + 1L)
      val bloom = BlockedBloom.fit(members.toDF("h"), "h", 10000L)
      val probes = (0L until 100000L).map(_ * 2L + 1000000000L)
      val memberPass = members.toDF("h")
        .filter(BloomMightContain.mightContain(col("h"), bloom)).count()
      assert(memberPass == members.size.toLong,
        "bloom_might_contain dropped a true member (false negative)")
      val fp = probes.toDF("h")
        .filter(BloomMightContain.mightContain(col("h"), bloom)).count()
      // design fpp ~1e-3 at 16 bits/key → expect ~100 of 100k; allow
      // an order of magnitude of slack before calling the layout broken
      assert(fp < 1000L, s"false-positive rate too high: $fp / 100000")
    }

    it("agrees between codegen'd and interpreted evaluation") {
      import org.apache.spark.sql.catalyst.expressions.Literal
      import spark.implicits._
      val bloom = BlockedBloom.fit(Seq(7L, 42L).toDF("h"), "h", 64L)
      val keys = Seq(7L, 42L, 8L, 43L, 0L, Long.MinValue, Long.MaxValue)
      val viaDf = keys.toDF("h")
        .select(BloomMightContain.mightContain(col("h"), bloom).as("m"))
        .collect().map(_.getBoolean(0)).toSeq
      val viaEval = keys.map { k =>
        BloomMightContain(Literal(k), bloom).eval(null)
          .asInstanceOf[Boolean]
      }
      assert(viaDf == viaEval)
      assert(viaEval.take(2) == Seq(true, true))
    }

    it("fits order-independently (OR-merge: retry/speculation-safe)") {
      import spark.implicits._
      val keys = (0L until 5000L).map(_ * 7L)
      val a = BlockedBloom.fit(keys.toDF("h").repartition(7), "h", 5000L)
      val b = BlockedBloom.fit(keys.reverse.toDF("h").repartition(3), "h", 5000L)
      assert(java.util.Arrays.equals(a.words, b.words),
        "sketch bits depend on partitioning/order")
    }
  }
}
