package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MultiSink

class EngineInfraSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("MultiSink: one materialization feeds N consistent sinks") {
    val dir = Files.createTempDirectory("multisink").toString
    // nondeterministic upstream (rand): both sinks must still agree
    val df = spark.range(100).select($"id", rand(42).as("r"))
    val counts = MultiSink.writeAll(df, Seq(
      "a" -> ((d: org.apache.spark.sql.DataFrame) => d.write.mode("overwrite").parquet(s"$dir/a")),
      "b" -> ((d: org.apache.spark.sql.DataFrame) => d.write.mode("overwrite").parquet(s"$dir/b")),
      // MROutput adapts any OutputFormat (write-format breadth): same
      // snapshot also lands as CSV and text lines
      "c" -> ((d: org.apache.spark.sql.DataFrame) =>
        d.write.mode("overwrite").option("header", "true").csv(s"$dir/c")),
      "t" -> ((d: org.apache.spark.sql.DataFrame) =>
        d.select(concat_ws("|", $"id", $"r")).write.mode("overwrite").text(s"$dir/t")),
      // columnar-format breadth: the same snapshot as ORC and JSON-lines
      "o" -> ((d: org.apache.spark.sql.DataFrame) =>
        d.write.mode("overwrite").orc(s"$dir/o")),
      "j" -> ((d: org.apache.spark.sql.DataFrame) =>
        d.write.mode("overwrite").json(s"$dir/j"))))
    assert(counts == Map("a" -> 100L, "b" -> 100L, "c" -> 100L, "t" -> 100L,
      "o" -> 100L, "j" -> 100L))
    val a = spark.read.parquet(s"$dir/a").orderBy("id").as[(Long, Double)].collect().toSeq
    val b = spark.read.parquet(s"$dir/b").orderBy("id").as[(Long, Double)].collect().toSeq
    assert(a == b)
    val c = spark.read.option("header", "true").csv(s"$dir/c")
      .select($"id".cast("long"), $"r".cast("double")).orderBy("id")
      .as[(Long, Double)].collect().toSeq
    assert(c == a) // Double.toString round-trips exactly
    assert(spark.read.text(s"$dir/t").count() == 100)
    val o = spark.read.orc(s"$dir/o").orderBy("id").as[(Long, Double)].collect().toSeq
    assert(o == a) // ORC round-trips the snapshot bit-exactly
    val j = spark.read.json(s"$dir/j").select($"id".cast("long"), $"r".cast("double"))
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(j == a)
  }

  test("dynamic partition overwrite replaces only the written partitions") {
    // INSERT OVERWRITE ... PARTITION semantics (the warehouse ingest
    // contract): a batch that writes partition grp=1 must not clobber the
    // other partitions — static overwrite mode would wipe the whole table
    val dir = Files.createTempDirectory("dynpart").toString + "/t"
    val full = spark.range(40).select($"id", ($"id" % 4).as("grp"))
    full.write.partitionBy("grp").parquet(dir)
    spark.range(100, 105).select($"id", lit(1L).as("grp"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("grp").parquet(dir)
    val back = spark.read.parquet(dir).select($"id", $"grp".cast("long"))
      .as[(Long, Long)].collect().toSet
    val expect = (0L until 40L).filter(_ % 4 != 1).map(i => (i, i % 4)).toSet ++
      (100L until 105L).map(i => (i, 1L))
    assert(back == expect)
  }

  test("Counters.track aggregates task metrics for the bracketed scope") {
    val (result, snap) = Counters.track(spark) {
      spark.range(10000).repartition(4).groupBy(($"id" % 10).as("k")).count().collect().length
    }
    assert(result == 10)
    assert(snap.tasks > 0)
    assert(snap.shuffleWriteBytes > 0 && snap.shuffleReadBytes > 0)
  }

  test("observe() counters ride the data path and report exact values") {
    val df = spark.range(1000).select($"id", ($"id" % 10).as("k"))
    val (cnt, metrics) = Counters.observed(spark, "probe", df,
      Seq(count(lit(1)).as("rows"), sum($"id").as("id_sum"))) { observed =>
      observed.filter($"k" >= 0).count()
    }
    assert(cnt == 1000L)
    assert(metrics.getAs[Long]("rows") == 1000L)
    assert(metrics.getAs[Long]("id_sum") == (0L until 1000L).sum)
  }

  test("partitioned sink round-trips and prunes partitions on read") {
    val dir = Files.createTempDirectory("psink").toString
    Seq((1L, "A", 1.0), (2L, "B", 2.0), (3L, "A", 3.0))
      .toDF("id", "part", "v")
      .write.partitionBy("part").mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).filter($"part" === "A")
    assert(back.select("id").as[Long].collect().toSet == Set(1L, 3L))
    val p = back.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // partition filter handled by pruning, not a data filter
    assert(p.contains("PartitionFilters"), p)
  }

  test("stratified sampling (sampleBy) is seed-deterministic per stratum") {
    val df = spark.range(10000).select($"id", ($"id" % 4).cast("string").as("grp"))
    val fractions = Map("0" -> 0.5, "1" -> 0.1, "2" -> 0.0, "3" -> 1.0)
    val s1 = df.stat.sampleBy("grp", fractions, seed = 42L)
    val s2 = df.stat.sampleBy("grp", fractions, seed = 42L)
    assert(s1.collect().toSeq == s2.collect().toSeq) // deterministic
    val counts = s1.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(!counts.contains("2") && counts("3") == 2500)
    assert(math.abs(counts("0") - 1250.0) < 200 && math.abs(counts("1") - 250.0) < 100)
  }

  test("Fanout spreads a single-partition frame to defaultParallelism") {
    val one = spark.range(100).coalesce(1).toDF()
    assert(one.rdd.getNumPartitions == 1)
    assert(Fanout(one).rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
  }

  test("Tables.events NTZ normalization is session-zone independent") {
    // An NTZ fixture's wall-clock values must map to the same instants
    // (NTZ read as UTC wall clock) whatever the session zone — a plain
    // CAST would reinterpret them in the session zone and shift.
    val dir = Files.createTempDirectory("graft-ntz").toString
    spark.sql(
      """SELECT CAST(id AS BIGINT) AS event_id,
        |  timestampadd(SECOND, CAST(id AS INT),
        |    to_timestamp_ntz('2024-01-01 00:00:00')) AS ts
        |FROM range(3)""".stripMargin)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val expected = 1704067200000000L // 2024-01-01T00:00:00Z in micros
    def micros(): Seq[Long] = {
      val t = Tables(spark, dir)
      assert(t.events.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType)
      t.events.select(expr("unix_micros(ts)")).as[Long].collect().toSeq.sorted
    }
    val inUtc = micros()
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
      assert(micros() == inUtc, "NTZ normalization shifted with session zone")
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
    assert(inUtc == Seq(expected, expected + 1000000L, expected + 2000000L))
  }

  test("Tables.events rejects an unexpected ts dtype loudly") {
    val dir = Files.createTempDirectory("graft-ntz-bad").toString
    spark.range(3).select($"id".as("event_id"), $"id".cast("int").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ex = intercept[IllegalStateException](Tables(spark, dir).events)
    assert(ex.getMessage.contains("unexpected type"))
  }
}
