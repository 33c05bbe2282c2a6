package graft.extensions

import graft.SparkSpec
import graft.streaming.{EventStream, StateStores}

/** Pins the executable sizing rule to the SCALE.md measured points and
  * proves configure() actually routes a stateful stream through the
  * chosen provider. */
class StateStoresSpec extends SparkSpec {

  describe("StateStores sizing rule") {

    it("reproduces the measured single-box verdicts") {
      // 15 M windowed keys on one 24 GiB JVM: measured GC death → RocksDB
      assert(StateStores.provider(15000000L, 1, 24.0)
        .contains(StateStores.RocksDbProvider))
      // 7.5 M dedup keys on one 24 GiB JVM sat ON the envelope edge
      // (completed, GC-pressured) — the rule's headroom must already
      // call RocksDB there
      assert(StateStores.provider(7500000L, 1, 24.0)
        .contains(StateStores.RocksDbProvider))
      // 1.5 M keys on one 24 GiB JVM: measured in-heap 2x FASTER
      assert(StateStores.provider(1500000L, 1, 24.0).isEmpty)
    }

    it("keys per EXECUTOR decide, not total keys") {
      // the same 15 M keys over 32 balanced 16 GiB executors is ~470 k
      // each — comfortably in-heap (SCALE.md's closing point)
      assert(StateStores.provider(15000000L, 32, 16.0).isEmpty)
      // shrink the fleet until the per-executor share crosses the line
      assert(StateStores.provider(15000000L, 2, 16.0)
        .contains(StateStores.RocksDbProvider))
    }

    it("liveKeyEstimate feeds the rule sensible planning numbers") {
      // r10 ask #6: the probe harness derives the rule's input from the
      // event table itself. On the test corpus: the estimate must be at
      // least the user population (session/window/join state) and at
      // most the total event count (dedup state can never exceed it),
      // and with the 2 h watermark horizon against the corpus's
      // multi-day span it must sit well below that ceiling.
      val sf = "/root/testdata/sf0.001"
      val ev = EventStream.readEvents(spark, sf)
      val users = ev.select("user_id").distinct().count()
      val n = ev.count()
      val est = EventStream.liveKeyEstimate(spark, sf)
      // approx_count_distinct tolerance on the user floor
      assert(est >= (users * 0.9).toLong && est <= n,
        s"estimate $est outside [$users*0.9, $n]")
      // and the composition picks in-heap for this tiny deployment
      assert(StateStores.provider(est, 1, 4.0).isEmpty)
    }

    it("configure() routes a real stateful stream through the choice") {
      val sf = "/root/testdata/sf0.001"
      val prev = spark.conf.getOption(StateStores.ProviderConf)
      try {
        // force the RocksDB branch with a deployment that needs it,
        // then run a real sessionization to completion under it
        val chosen = StateStores.configure(spark, 15000000L, 1, 24.0)
        assert(chosen == StateStores.RocksDbProvider)
        assert(spark.conf.get(StateStores.ProviderConf) == chosen)
        val out = EventStream.runSessionizeAllOnce(spark, sf,
          gapMs = 6L * 3600 * 1000, queryName = "t_sizing_rocks")
        assert(out.count() > 0)
        // and the in-heap branch must restore the default provider
        // (unset falls back to the conf's built-in default, the
        // HDFS-backed in-heap store — not to an absent key)
        val back = StateStores.configure(spark, 1000L, 1, 4.0)
        assert(back == "in-heap (default)")
        assert(!spark.conf.get(StateStores.ProviderConf).contains("RocksDB"))
      } finally prev match {
        case Some(v) => spark.conf.set(StateStores.ProviderConf, v)
        case None => spark.conf.unset(StateStores.ProviderConf)
      }
    }
  }
}
