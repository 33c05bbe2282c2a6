package graft
import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** The bench contract is "the driver can parse the JSON line out of a
 * bounded tail of combined stdout+stderr". Five rounds of `"parsed": null`
 * (BENCH_r01..r05) were caused by an sbt "[info] " prefix, then by the line
 * outgrowing the 2000-byte tail window. This spec simulates that exact
 * capture: build the stream Bench.main emits (with the REAL current query
 * names, so the check tightens as the query set grows), clip to the last
 * 2000 bytes, and assert a clean parseable line survives with the headline
 * fields intact. Jackson (on Spark's classpath) is the parser, like the
 * driver's json.loads — structural string checks proved too forgiving. */
class BenchLineSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()
  private val names = SparkEntry.queries.keys.toSeq.sorted
  // deterministic plausible timings: mostly sub-second, a few 10s-scale
  private val results: Seq[(String, Double)] =
    names.zipWithIndex.map { case (n, i) =>
      n -> (0.107 + (i % 29) * 0.37 + (if (i % 13 == 0) 11.4 else 0.0))
    }
  private val epilogue =
    "\n[success] Total time: 941 s (15:41), completed Aug 13, 2026, 3:33:57 AM\n"

  private def window(stream: String, w: Int = 2000): String =
    stream.substring(math.max(0, stream.length - w))

  private def parsedLines(tail: String) =
    tail.split('\n').toSeq.flatMap { l =>
      try Some(mapper.readTree(l)) catch { case _: Throwable => None }
    }.filter(n => n.isObject && n.has("metric"))

  test("compact line fits the tail budget with the full current query set") {
    val line = Bench.compactLine(results, "sf0.1")
    assert(line.length <= Bench.Budget,
      s"compact line is ${line.length} B > ${Bench.Budget} B budget")
    val node = mapper.readTree(line)
    assert(node.get("metric").asText == "total")
    assert(node.get("value").asDouble > 0.0)
    assert(node.get("unit").asText == "sec")
    // the CURRENT query set must fit withOUT engaging the drop path —
    // when a future query pushes past the budget this fails loudly,
    // forcing a conscious re-size instead of silent dict truncation
    assert(node.get("queries").size == names.size && node.get("dropped") == null,
      s"query dict no longer fits the ${Bench.Budget} B budget whole " +
        s"(${node.get("queries").size}/${names.size} kept) — shrink the " +
        "rendering or re-measure the driver's tail window")
  }

  test("a parseable headline line survives a 2000-byte bounded tail capture") {
    // the stream Bench.main produces: chatter, full-precision line, stderr
    // WARN chatter interleaved by the capture, then the final compact line
    // and sbt's epilogue.
    val full = Bench.renderLine(results, "/root/testdata/sf0.1", 3)
    val stream = "26/08/13 01:00:00 WARN SomeSource: chatter\n" * 20 +
      full + "\n" +
      "[error] 26/08/13 01:00:01 WARN SparkEnv: shutdown chatter\n" +
      Bench.compactLine(results, "sf0.1") + epilogue
    val ok = parsedLines(window(stream))
    assert(ok.nonEmpty, "no parseable {\"metric\":...} line in the tail")
    val n = ok.last
    assert(n.get("metric").asText == "total" && n.get("value").asDouble > 0.0)
    // per-query timings survive too (possibly via the "dropped" degrade)
    assert(n.get("queries").size > 0)
  }

  test("degrade path stays parseable and labels what it drops") {
    // force the last-resort path with a tiny budget
    val line = Bench.compactLine(results, "sf0.1", budget = 400)
    assert(line.length <= 400)
    val n = mapper.readTree(line)
    assert(n.get("metric").asText == "total")
    assert(n.get("queries").size + n.get("dropped").asInt == names.size)
    // it reports the slowest queries, not an arbitrary subset
    val kept = results.sortBy(-_._2).take(n.get("queries").size).map(_._1).toSet
    val it = n.get("queries").fieldNames()
    while (it.hasNext) assert(kept.contains(it.next()))
  }

  test("renderLine total equals the sum of per-query timings") {
    val line = Bench.renderLine(results, "sf0.1", 3)
    val n = mapper.readTree(line)
    assert(math.abs(n.get("value").asDouble - results.map(_._2).sum) < 1e-3)
  }
}
