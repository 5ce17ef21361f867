package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory + table catalog for the graft engine.
  *
  * The engine replaces the reference's session mode / container reuse
  * (tez-api/src/main/java/org/apache/tez/client/TezClient.java:313,
  * TezConfiguration.java:176-177) with one long-lived SparkSession with AQE
  * enabled — AQE subsumes the reference's ShuffleVertexManager
  * auto-reduce-parallelism (ShuffleVertexManager.java:100-111,557).
  */
object Engine {

  /** Tuned for local[N] correctness runs AND mirroring what a 1000-executor
    * cluster config would look like: AQE on (runtime partition coalescing,
    * skew-join splitting, join-strategy switch), 100 MB advisory partition
    * size (= the reference's desired-task-input-size,
    * ShuffleVertexManager.java:108-111), broadcast threshold generous since
    * dims are small relative to facts.
    */
  def session(cores: Int = defaultCores, appName: String = "graft"): SparkSession = {
    val b = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
    val s = configure(b, cores).getOrCreate()
    graft.functions.install(s)
    s
  }

  def defaultCores: Int =
    sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)

  /** Apply engine defaults to any builder (shared by Bench/Verify/tests). */
  def configure(b: SparkSession.Builder, cores: Int): SparkSession.Builder = b
    .config("spark.sql.shuffle.partitions", cores.toString)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "100m")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", "64m")
    .config("spark.sql.files.maxPartitionBytes", "128m")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.parquet.filterPushdown", "true")
    // The MinHash/SimHash signature aggregates carry 64/61 agg slots; the
    // default maxFields=100 (buffer + key + input fields) silently drops
    // those stages out of whole-stage codegen into interpreted mode.
    .config("spark.sql.codegen.maxFields", "400")
    // events.parquet carries TIMESTAMP(NANOS); Spark has no ns timestamp —
    // read as long and convert (Tables.events) to the same µs truncation
    // DuckDB applies, so oracle comparisons line up exactly.
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Straggler re-execution (≅ the reference's legacy speculator,
    // tez-dag/.../speculation/legacy/LegacySpeculator.java, off by default
    // via TezConfiguration.java:438-439): Spark's speculative execution is
    // the same knob. Off here — single-JVM local mode has no slow-node
    // stragglers, only contention, where a speculative copy doubles the
    // work. On a 1000-executor fleet set spark.speculation=true (with the
    // default quantile/multiplier) to cut tail latency from sick hosts.
    .config("spark.speculation", "false")
    .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
}

object Fanout {
  /** Explicit-width repartition before CPU-heavy per-row work (hashing,
    * shingling, vector math) — GATED on the input's actual partition count.
    * Small dimension-ish tables arrive as ONE scan partition (file <
    * maxPartitionBytes), which would serialize the expensive narrow stage
    * on a single core; an explicit number (unlike `repartition()`) is
    * exempt from AQE partition coalescing, so the work actually spreads.
    * At real scale the scan already has ≥ defaultParallelism splits and the
    * repartition would be a FULL exchange of the raw corpus for nothing —
    * so it is skipped entirely (no Exchange in the plan), not inserted and
    * hoped away.
    */
  def apply(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}

/** Typed handle on one scale-factor directory of the harness tables
  * (TESTDATA.md). Every query takes (SparkSession, sfDir) and goes through
  * here so the scan layer stays in one place (column pruning + predicate
  * pushdown are Catalyst's job; we only declare the reads).
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")
  /** Normalize the events `ts` column to session-zone TimestampType however
    * the generator wrote it: raw int96-era nanos read as long via
    * `nanosAsLong` (truncate to µs exactly like DuckDB's parquet reader),
    * native µs timestamps, or TIMESTAMP_NTZ (value-preserving cast under the
    * UTC session zone). Keeps every downstream consumer — watermarks,
    * unix_micros, window() — on one type regardless of fixture vintage.
    */
  private def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType      => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType => df
      // NTZ → instant via an NTZ-native micros-since-epoch diff:
      // value-preserving regardless of the session time zone (a plain CAST
      // would reinterpret the wall clock in the session zone — correct
      // only under UTC; unix_micros rejects NTZ input outright).
      case TimestampNTZType =>
        df.withColumn("ts", expr(
          "timestamp_micros(timestampdiff(MICROSECOND, " +
            "TIMESTAMP_NTZ'1970-01-01 00:00:00', ts))"))
      // any other dtype is fixture schema drift — fail loudly rather than
      // silently reinterpret (e.g. an int column as epoch-seconds)
      case other => throw new IllegalStateException(
        s"events.ts has unexpected type $other; expected LONG, TIMESTAMP or TIMESTAMP_NTZ")
    }
  }

  def events: DataFrame = normalizeTs(table("events"))

  /** Streaming read of the events table (same ts normalization as [[events]]).
    * The file source needs a directory; the glob filter scopes it to the
    * events file so other tables in the SF dir aren't picked up.
    */
  def eventsStream: DataFrame =
    normalizeTs(
      spark.readStream
        .schema(table("events").schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")

  /** All harness tables. */
  def names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table as a temp view so the full surface is usable from
    * `spark.sql(...)` alongside the custom functions — the one-call setup a
    * user migrating from the reference needs for a SQL workflow.
    */
  def registerViews(): Unit = names.foreach { n =>
    val df = if (n == "events") events else table(n)
    df.createOrReplaceTempView(n)
  }
}
