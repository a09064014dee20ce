package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-bench", Sessions.cpusFromEnv())
    // Headline set = every query except (a) the five micro-batch
    // streaming runs (q32/q33/q41/q62/q69): those measure Structured
    // Streaming machinery (temp staging, checkpoints, state store), not
    // engine throughput — their SEMANTICS are benched via the batch
    // formulations q42/q43/q60/q63 (q69's batch shape is the q11-family
    // broadcast join) and correctness-gated via the streaming runs in
    // Verify; and (b) q24, the deliberately-quadratic crossJoin oracle
    // for the embedding near-dup relation — its benched scale path is
    // q59 (SRP-LSH bucketed, same relation). q59 is the deliberate
    // STRESS row of the set: a loose 0.4 threshold on a near-random
    // relation maximizes candidate volume by design (the recall gate in
    // DedupSpec is what it buys); the production-regime cost claim is
    // q61 (threshold 0.9, fine buckets), which runs ~5x faster.
    val headline = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) =>
        Set("q32_stream_hourly", "q33_sessionization", "q41_stream_dedup",
          "q62_stream_join", "q69_stream_enrich", "q24_embed_neardup")(name) }
    // Warm-up: session init + first codegen compile land outside timings.
    try SparkEntry.queries("q01_scan_topk")(spark, sfDir).count()
    catch { case _: Throwable => () }
    // Best of 2 runs per query: one JIT/page-cache-warm repeat removes
    // most run-to-run variance without changing what is measured.
    // Failures report as -1 so a broken query can never read as a fast
    // one (and -1 survives the min()).
    val results = headline.map { case (name, fn) =>
      def run(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
        }
      }
      name -> math.min(run(), run())
    }
    val qs = results.map { case (k, v) => JsonStr(k) + ":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => k }
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    if (failed.nonEmpty)
      System.err.println(s"[bench] ${failed.size} queries failed: ${failed.mkString(",")}")
    // Suspect list: regressions should be flagged BY the build, not
    // found by a reader diffing round artifacts. `bench_latest.json`
    // is the committed full line from the previous round's run; a
    // query is suspect when it is both >2x slower than last round AND
    // >0.1 s slower in absolute terms (the ratio alone flags 30 ms
    // jitter on sub-0.1 s queries, which is noise, not regression).
    val prev: Map[String, Double] =
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("bench_latest.json")))
        """"(q\d+[a-z0-9_]*)":(-?\d+(?:\.\d+)?([eE]-?\d+)?)""".r
          .findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      } catch { case _: Throwable => Map.empty }
    val suspect = results.collect {
      case (k, v) if v >= 0 && prev.get(k).exists(p => p > 0 && v > 2 * p && v - p > 0.1) => k
    }
    if (suspect.nonEmpty)
      System.err.println(s"[bench] SUSPECT (>2x vs previous round): ${suspect.mkString(",")}")
    // Brokenness must be visible IN the machine-readable line, not only
    // on stderr: a failed query is excluded from the total (its own -1
    // stays in the per-query map), so without the failed list a
    // partially-broken build would read as a FASTER one.
    val failedJson = failed.map(JsonStr(_)).mkString("[", ",", "]")
    val suspectJson = suspect.map(JsonStr(_)).mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","n_failed":${failed.size},""" +
      s""""failed":$failedJson,"suspect":$suspectJson,"queries":$qs,"sf":${JsonStr(sfDir)}}"""
    println(line)
    // The driver captures only the TAIL of stdout, which truncated
    // q01–q28 out of BENCH_r05.json ("parsed": null). Persist the full
    // line twice: target/bench.json for the round artifact, and
    // bench_latest.json at the repo root so (a) it gets committed with
    // the round and (b) the next round's suspect comparison above has a
    // complete, parseable baseline.
    for (p <- Seq("target/bench.json", "bench_latest.json")) {
      try {
        val path = java.nio.file.Paths.get(p)
        Option(path.getParent).foreach(java.nio.file.Files.createDirectories(_))
        java.nio.file.Files.write(path,
          (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      } catch { case e: Throwable =>
        System.err.println(s"[bench] could not write $p: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
