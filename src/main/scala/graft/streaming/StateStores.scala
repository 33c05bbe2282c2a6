package graft.streaming

import org.apache.spark.sql.SparkSession

/** Executable form of the measured in-heap ↔ RocksDB state-store sizing
  * rule (SCALE.md §"In-heap vs RocksDB: the measured sizing curve",
  * round 9): the default HDFS-backed provider keeps every live key on
  * the executor heap and wins on latency at EVERY volume where it
  * survives (1.1×–2× vs RocksDB), but dies on a GC cliff — 15 M
  * windowed keys never complete a batch on a 24 GiB heap, while RocksDB
  * completes at a 2–6× per-op cost. The published rule: stay in-heap
  * while live state per executor is under ~300 k keys per executor-GiB
  * (~half the measured cliff of ~625 k/GiB, leaving headroom for batch
  * transients and the rest of the heap's tenants); switch to RocksDB
  * beyond. State volume per EXECUTOR is what counts: 15 M total keys
  * over 32 balanced executors is ~470 k each — in-heap territory on
  * any real heap — so the provider choice is a function of the
  * DEPLOYMENT, not of the query, which is why it's a conf and not a
  * query rewrite.
  */
object StateStores {

  val RocksDbProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  val ProviderConf = "spark.sql.streaming.stateStore.providerClass"

  /** Measured envelope: keys one executor-GiB sustains in-heap without
    * GC collapse, with ~2× headroom under the observed cliff
    * (SCALE.md: 15 M keys / 24 GiB ≈ 625 k/GiB never completes;
    * 7.5 M / 24 GiB ≈ 312 k/GiB completes GC-pressured). */
  val InHeapKeysPerGiB: Long = 300000L

  /** True when `liveKeys` spread over `executors` JVMs of
    * `executorHeapGiB` each stays inside the in-heap envelope. */
  def inHeapSafe(liveKeys: Long, executors: Int,
      executorHeapGiB: Double): Boolean = {
    require(executors > 0 && executorHeapGiB > 0,
      s"executors=$executors heapGiB=$executorHeapGiB")
    liveKeys.toDouble / executors <= InHeapKeysPerGiB * executorHeapGiB
  }

  /** The provider class to set for this deployment, or None to keep
    * Spark's in-heap default. */
  def provider(liveKeys: Long, executors: Int,
      executorHeapGiB: Double): Option[String] =
    if (inHeapSafe(liveKeys, executors, executorHeapGiB)) None
    else Some(RocksDbProvider)

  /** Apply the rule to the session: sets the provider conf (or restores
    * the in-heap default) and returns the effective provider name for
    * logging. The conf is read at QUERY START, so call this before
    * `writeStream.start()` / the bounded runners — never mid-stream. */
  def configure(spark: SparkSession, liveKeys: Long, executors: Int,
      executorHeapGiB: Double): String =
    provider(liveKeys, executors, executorHeapGiB) match {
      case Some(p) => spark.conf.set(ProviderConf, p); p
      case None => spark.conf.unset(ProviderConf); "in-heap (default)"
    }
}
