package graft

import org.apache.spark.sql.functions._

/** Executor-loss resilience proof (SCALE.md §separate-JVM): under a
  * local-cluster master, SIGKILL one of the two forked executor JVMs
  * while a batch of contract queries is mid-flight, and assert the run
  * completes with per-query results identical to a clean pass.
  *
  * What this exercises that nothing else in the repo does: loss of a
  * live executor's shuffle map outputs (no external shuffle service →
  * FetchFailed → map-stage resubmission on the survivor), loss of its
  * cached fixture blocks (persisted LSH signature / shingle frames →
  * lineage recompute), and standalone executor replacement (the Master
  * relaunches a new executor mid-application) — the failure sequence a
  * 1000-executor cluster runs weekly. The 100-query oracle gate proves
  * cluster-mode CORRECTNESS; this proves cluster-mode FAULT RECOVERY.
  *
  * Run via `scripts/cluster_run.sh graft.ExecutorLossProof [sfDir]
  * [query,query,...]`. Exit 0 = all hashes match and the kill landed
  * mid-run; exit 2 = inconclusive (queries finished before the kill —
  * rerun with a heavier list); exit 1 = mismatch (a real defect).
  *
  * Hashing is executor-side (sum+count of xxhash64 over every column
  * cast to string, column order fixed by sort) so the proof never
  * collects result rows to the driver.
  */
object ExecutorLossProof {

  /** Executor JVMs of THIS application only: the backend's cmdline
    * carries `--app-id <applicationId>`, and scoping on it keeps the
    * SIGKILL from landing on an unrelated Spark job sharing the box
    * (e.g. a concurrent cluster_run.sh — its executors also match a
    * bare CoarseGrainedExecutorBackend scan). */
  private def executorPids(appId: String): Seq[Long] = {
    val self = ProcessHandle.current().pid()
    val procs = new java.io.File("/proc").listFiles()
    if (procs == null) return Seq.empty
    procs.toSeq.flatMap { f =>
      val pid = f.getName
      if (!pid.forall(_.isDigit) || pid.toLong == self) None
      else try {
        val cmd = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"/proc/$pid/cmdline")), "UTF-8")
        if (cmd.contains("CoarseGrainedExecutorBackend") &&
          cmd.contains(appId)) Some(pid.toLong)
        else None
      } catch { case _: Throwable => None }
    }.sorted
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      (if (args.length > 1) args(1) else
        "x4_dedup_exact,x26_semantic_components,x29_curation_pipeline,y4_lsh_ann")
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(Sessions.isSeparateJvm("local[16]"),
      "run under local-cluster via scripts/cluster_run.sh (SPARK_GRAFT_MASTER)")
    val spark = Sessions.builder("local[16]", "32")
      .appName("graft-executor-loss").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // sum the row hashes in decimal(38,0): order-independent, keeps row
    // multiplicity, and cannot hit ANSI long overflow (sum(xxhash64)
    // over full-range longs throws ARITHMETIC_OVERFLOW under Spark 4's
    // default ANSI mode — found the hard way on the first run).
    def pass(): Seq[(String, String, Long)] = names.map { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val cols = df.columns.sorted.map(c => col(c).cast("string"))
      val r = df.select(xxhash64(
        scala.collection.immutable.ArraySeq.unsafeWrapArray(cols): _*).cast("decimal(38,0)").as("h"))
        .agg(sum("h").as("hs"), count(lit(1)).as("n")).head()
      (n, String.valueOf(r.getDecimal(0)), r.getLong(1))
    }

    // pass 0: build the pay-once fixtures + JIT warm (untimed, like Bench)
    pass()
    val t1 = System.nanoTime()
    val clean = pass()
    val cleanWall = (System.nanoTime() - t1) / 1e9
    println(f"[exekill] clean pass: ${cleanWall}%.1f s over ${names.size} queries")

    val appId = spark.sparkContext.applicationId
    val before = executorPids(appId)
    println(s"[exekill] executor JVMs before: ${before.mkString(", ")}")
    require(before.size >= 2, s"expected >=2 forked executors, saw $before")

    @volatile var killedAt = 0L
    @volatile var killedPid = 0L
    @volatile var stagesAtKill = -1
    val tracker = spark.sparkContext.statusTracker
    val killer = new Thread(() => {
      Thread.sleep(math.max(200L, (cleanWall * 0.3 * 1000).toLong))
      // fire only while a stage is actually executing, so the SIGKILL
      // provably lands mid-stage (running tasks die with the JVM),
      // not in a gap between queries
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (tracker.getActiveStageIds().isEmpty &&
        System.nanoTime() < deadline) Thread.sleep(20)
      val victim = executorPids(appId).headOption.getOrElse(0L)
      if (victim != 0L) {
        stagesAtKill = tracker.getActiveStageIds().length
        new ProcessBuilder("kill", "-9", victim.toString).start().waitFor()
        killedPid = victim
        killedAt = System.nanoTime()
        System.err.println(
          s"[exekill] SIGKILL executor pid $victim ($stagesAtKill active stages)")
      }
    })
    val t2 = System.nanoTime()
    killer.start()
    val wounded = pass()
    val woundedEnd = System.nanoTime()
    killer.join()
    val woundedWall = (woundedEnd - t2) / 1e9
    val after = executorPids(appId)
    println(f"[exekill] wounded pass: ${woundedWall}%.1f s; killed pid $killedPid mid-stage (active stages at kill: $stagesAtKill); executors after: ${after.mkString(", ")}")

    if (killedPid == 0L || killedAt >= woundedEnd || stagesAtKill < 1) {
      println("[exekill] INCONCLUSIVE: kill did not land mid-run — rerun with a heavier query list")
      spark.stop(); sys.exit(2)
    }
    val bad = clean.zip(wounded).filter { case (c, w) => c != w }
    bad.foreach { case (c, w) =>
      println(s"[exekill] MISMATCH clean=$c wounded=$w")
    }
    clean.zip(wounded).foreach { case ((n, h, r), (_, h2, r2)) =>
      println(s"[exekill] $n rows=$r hash=$h ${if (h == h2 && r == r2) "MATCH" else s"!= rows=$r2 hash=$h2"}")
    }
    val replaced = after.exists(p => !before.contains(p))
    println(s"[exekill] replacement executor launched: $replaced")
    spark.stop()
    sys.exit(if (bad.isEmpty) 0 else 1)
  }
}
