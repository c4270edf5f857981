package graft

import com.fasterxml.jackson.databind.ObjectMapper

/** The bench LINE contract (round-11 verdict #1): the emitted line must be
  * O(1) in the query count — per-family rollups, never per-query timings —
  * so surface growth can never overflow the driver's 2000-char tail
  * capture again (the per-query line hit 1867/1900 at 141 queries). The
  * driver's parse is mirrored by `tools/bench_line_check.py`; this spec
  * pins the producer side: a 160-query synthetic surface stays under the
  * 1700-char budget and parses as JSON with the contract's fields.
  */
class BenchLineSpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  private def syntheticResults(n: Int): Seq[(String, Double)] = {
    // spread across all 7 real families with realistic name lengths
    val fams = Seq("q", "p", "d", "s", "st", "t", "m")
    (1 to n).map { i =>
      val f = fams(i % fams.length)
      (f"${f}$i%02d_synthetic_query_name_$i", 0.25 + (i % 17) * 0.37)
    }
  }

  private def window(results: Seq[(String, Double)]): Bench.Window =
    Bench.Window("live", 1001.0, 845.0, 0.35, 2.6, 0.11,
      265000000L, 113000000L, results)

  test("160-query surface emits a parseable line within the 1700-char budget") {
    val w = window(syntheticResults(160))
    val line = Bench.formatLine(w, Seq(w), 0, "sf0.1", 600572L)
    assert(line.length <= 1700, s"line is ${line.length} chars:\n$line")
    // the driver json-parses the tail capture; the line must stand alone
    val node = mapper.readTree(line)
    assert(node.get("metric").asText == "total")
    assert(node.get("unit").asText == "sec")
    assert(node.get("n").asInt == 160)
    assert(node.get("sf").asText == "sf0.1")
    assert(node.get("win_src").asText == "live")
    assert(node.get("queries").size <= 7) // families, not queries
    assert(math.abs(node.get("value").asDouble - w.total) < 0.01)
    // throughput fields survive the restructure (BASELINE comparisons)
    assert(node.get("throughput_mbps").get("csv_to_csv").asDouble > 0)
    assert(node.get("rows_per_sec").get("pp").asDouble > 0)
  }

  test("family rollup partitions the total; failures excluded and listed") {
    val results = Seq(
      "q01_agg" -> 1.5, "q02_filter" -> 0.5, "st03_stream" -> 2.0,
      "s04_knn" -> 1.0, "st05_other" -> -1.0)
    val roll = Bench.familyRollup(results).toMap
    assert(roll == Map("q" -> 2.0, "st" -> 2.0, "s" -> 1.0))
    assert(Bench.failedKeys(results) == Seq("st05"))
    val w = window(results)
    val line = Bench.formatLine(w, Seq(w), 0, "sf0.01", 1000L)
    val node = mapper.readTree(line)
    assert(node.get("n").asInt == 4) // failed query not counted
    assert(node.get("fail").get(0).asText == "st05")
    assert(math.abs(node.get("value").asDouble - 5.0) < 1e-9)
  }

  test("family extraction: st queries do not collapse into the s family") {
    assert(Bench.family("s01_knn_brute") == "s")
    assert(Bench.family("st01_streaming_hourly") == "st")
    assert(Bench.family("q54_pagination") == "q")
  }

  test("rich artifact carries full per-query timings") {
    val w = window(syntheticResults(160))
    val line = Bench.formatLine(w, Seq(w), 0, "sf0.1", 600572L)
    val rich = mapper.readTree(Bench.formatRich(line, w, Seq(w)))
    assert(rich.get("queries_full").size == 160)
    assert(rich.get("line").get("metric").asText == "total")
    assert(rich.get("windows_full").get(0).get("cc_mbps").asDouble > 0)
  }

  test("history round-trips through the jsonl file and filters on fingerprint/sf/surface") {
    val results = syntheticResults(12)
    val w = window(results)
    val dir = tmpDir("bench-hist")
    val path = dir.resolve("hist.jsonl")
    val lines = Seq(
      Bench.historyLine("fp_a", "sf0.1", w),
      Bench.historyLine("fp_b", "sf0.1", w), // other code state
      Bench.historyLine("fp_a", "sf0.01", w), // other fixture
      Bench.historyLine("fp_a", "sf0.1",
        w.copy(results = results.drop(1)))) // surface changed
    java.nio.file.Files.writeString(path, lines.mkString("", "\n", "\n"))
    val got = Bench.loadHistory(spark, path, "fp_a", "sf0.1",
      results.map(_._1).toSet)
    assert(got.size == 1)
    val h = got.head
    assert(h.src == "hist")
    assert(h.canaryPre == w.canaryPre && h.csvBytes == w.csvBytes)
    assert(h.results.toMap.keySet == results.map(_._1).toSet)
    assert(math.abs(h.total - w.total) < 0.01)
    // unreadable history must disable itself, never fail the bench
    java.nio.file.Files.writeString(path, "not json at all\n{broken")
    assert(Bench.loadHistory(spark, path, "fp_a", "sf0.1",
      results.map(_._1).toSet).isEmpty)
  }

  test("source fingerprint is stable and content-sensitive") {
    val a = Bench.srcFingerprint()
    val b = Bench.srcFingerprint()
    assert(a == b && a.length == 16)
    assert(Bench.srcFingerprint("does/not/exist") == "nosrc")
  }
}
