package graft

import org.apache.spark.sql.SparkSession

/** Single place for engine session configuration so Verify, Bench, tests,
  * and library users all run with the same semantics.
  */
object Sessions {

  /** Configs that affect correctness/semantics — applied to any builder. */
  def withEngineConfigs(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.session.timeZone", "UTC")
      // Some events.parquet generations carry TIMESTAMP(NANOS); read as
      // epoch-nanos long (Spark has no native nanos type) and let
      // Tables.normalizeTs convert. Harmless for micros-encoded data.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // Streaming state off-heap in RocksDB: the HDFS-backed in-memory
      // provider holds every key on the JVM heap — fine for tests, a
      // non-starter for 100 TB/day sessionization state.
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // The rank-filter → WindowGroupLimit rewrite silently stops at
      // rank 1000 (spark.sql.optimizer.windowGroupLimitThreshold
      // default). Several operators lean on the rewrite's map-side
      // prune with operator-level caps just above it (q21's
      // maxBucket+1 = 1001 skew guard), and losing it degrades to a
      // full sort-shuffle of the pruned relation — raise the ceiling
      // well past any cap the engine uses.
      .config("spark.sql.optimizer.windowGroupLimitThreshold", "1048576")
      .config("spark.ui.enabled", "false")

  /** Local session sized for the harness box: `local[cpus]`, shuffle
    * partitions matched to cores (not the 200 default — SURVEY §7 env
    * notes), AQE on so runtime coalescing/skew-splitting still applies at
    * cluster scale.
    */
  def local(appName: String, cpus: Int): SparkSession = {
    val s = withEngineConfigs(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .appName(appName)
        .config("spark.sql.shuffle.partitions", cpus.toString))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    functions.GraftFunctions.register(s)
    s
  }

  def cpusFromEnv(default: Int = 4): Int =
    // non-positive values (a harness' cores-minus-reserved underflow)
    // would build an unconstructible local[0] — fall back instead
    sys.env.get("SPARK_GRAFT_CPUS").flatMap(_.toIntOption)
      .filter(_ > 0).getOrElse(default)
}
