package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.ExplainMode

import graft.{Engine, SparkEntry}

/** Dumps the FULL `explain("formatted")` output of selected queries to
  * files — the optimization-round evidence artifact (`plans/r<N>/`), where
  * PLANS.md keeps only the abridged headline dumps.
  *
  * Usage: sbt "runMain graft.tools.PlanSnap <outDir> <suffix> <q1,q2,...>"
  * with SPARK_GRAFT_SF_DIR selecting the data directory (default sf0.1 —
  * the driver's bench SF, so plan shapes match what the bench times).
  * Writes `<outDir>/<query>_<suffix>.txt` per query.
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length == 3,
      s"usage: PlanSnap <outDir> <suffix> <q1,q2,...> (got ${args.length} args)")
    val Array(outDir, suffix, list) = args
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session(appName = "plansnap")
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val wanted = list.split(',').map(_.trim).filter(_.nonEmpty)
    for (prefix <- wanted) {
      val hits = SparkEntry.queries.keys.filter(_.startsWith(prefix)).toSeq.sorted
      require(hits.nonEmpty, s"no query matches prefix $prefix")
      for (name <- hits) {
        val df = SparkEntry.queries(name)(spark, dir)
        val plan = df.queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
        println(s"[plansnap] $outDir/${name}_$suffix.txt")
        graft.CacheScope.drain()
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
