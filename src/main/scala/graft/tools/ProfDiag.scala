package graft.tools

import org.apache.spark.sql.functions._

import graft.{Engine, Tables}
import graft.CacheScope.ScopedPersist

/** Temporary diagnostic (round-17): stage-by-stage wall/taskTime of the
  * q150 robustProfile decomposition, to attribute its ~4s bench row before
  * touching Profiling.scala. Read-only — never on a query path.
  */
object ProfDiag {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session(appName = "profdiag")
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, dir)
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val stageLog =
      new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long, Int)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          taskMs.addAndGet(e.stageInfo.taskMetrics.executorRunTime)
          stageLog.add((e.stageInfo.stageId, e.stageInfo.name.takeWhile(_ != '\n'),
            e.stageInfo.taskMetrics.executorRunTime, e.stageInfo.numTasks))
        }
      })
    def timed[A](label: String)(f: => A): A = {
      val (j0, m0) = (jobs.get, taskMs.get)
      stageLog.clear()
      val t0 = System.nanoTime(); val r = f
      println(f"[diag] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s" +
        f"  jobs=${jobs.get - j0}%3d taskTime=${(taskMs.get - m0) / 1e3}%7.2f s")
      import scala.jdk.CollectionConverters._
      stageLog.asScala.toSeq.sortBy(-_._3).take(8).foreach { case (id, n, ms, nt) =>
        println(f"[diag]    stage $id%4d $n%-60s ${ms / 1e3}%7.2f s  tasks=$nt")
      }
      r
    }
    import org.apache.spark.sql.types.DecimalType
    val probs = Seq(0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99)
    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      val vdf = timed("vdf persist+count") {
        val d = t.lineitem.select(col("l_extendedprice").cast("double").as("__v"))
          .filter(col("__v").isNotNull).persistScoped()
        d.count(); d
      }
      val qs = timed("exactQuantiles(values)") {
        val d = graft.operators.Profiling
          .exactQuantiles(vdf, col("__v"), (probs ++ Seq(0.01, 0.99, 0.5)).distinct)
          .persistScoped()
        d.count(); d
      }
      val cuts = qs.agg(
        min(when(col("prob") === 0.01, col("value"))).as("__lo"),
        max(when(col("prob") === 0.99, col("value"))).as("__hi"),
        min(when(col("prob") === 0.5, col("value"))).as("med"))
      val moments = timed("moments (decimal-cast sums)") {
        val d = vdf.crossJoin(broadcast(cuts))
          .select(least(greatest(col("__v"), col("__lo")), col("__hi")).as("w"),
            col("med"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("w").cast(DecimalType(38, 2))).cast("double").as("__s"),
            sum((col("w") * col("w")).cast(DecimalType(38, 4)))
              .cast("double").as("__ss"),
            min(col("med")).as("med"))
          .persistScoped()
        d.count(); d
      }
      timed("moments (long-cents sums)") {
        vdf.crossJoin(broadcast(cuts))
          .select(least(greatest(col("__v"), col("__lo")), col("__hi")).as("w"),
            col("med"))
          .agg(count(lit(1)).as("n_rows"),
            sum(round(col("w") * 100, 0).cast("long")).as("__sc"),
            sum((round(col("w") * 100, 0).cast("long")
              * round(col("w") * 100, 0).cast("long"))
              .cast(DecimalType(38, 0))).as("__ssc"),
            min(col("med")).as("med"))
          .write.format("noop").mode("overwrite").save()
      }
      val dev = vdf.crossJoin(broadcast(moments.select(col("med").as("__m"))))
        .select(abs(col("__v") - col("__m")).as("__ad"))
      val mad1 = timed("exactQuantiles(deviations)") {
        val d = graft.operators.Profiling.exactQuantiles(dev, col("__ad"), Seq(0.5))
          .agg(min(col("value")).as("mad")).persistScoped()
        d.count(); d
      }
      timed("outlier count pass") {
        dev.crossJoin(broadcast(mad1))
          .agg(sum(when(col("__ad") > lit(4.4478) * col("mad"), 1L).otherwise(0L))
            .as("n_outliers"), min(col("mad")).as("mad"))
          .write.format("noop").mode("overwrite").save()
      }
      graft.CacheScope.drain()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
