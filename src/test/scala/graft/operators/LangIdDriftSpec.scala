package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The drift-alert CALIBRATION protocol (q249's operator): resample
  * in-distribution batches under the frozen model, read the JSD spread,
  * and verify the documented threshold separates sampling noise from a
  * genuinely drifted batch — zero false positives on resampled
  * in-distribution batches, the planted single-language batch alerting.
  */
class LangIdDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Tau = 0.08 // Pipeline.DriftTau — the documented threshold

  test("langIdDriftBatches: resampled in-distribution FPR = 0 at tau; planted skew alerts") {
    try {
      val alphabets = Seq("aa" -> "abcde", "bb" -> "fghij", "cc" -> "klmno")
      val rnd = new scala.util.Random(13)
      val docs = (for (((lang, alpha), li) <- alphabets.zipWithIndex;
                       i <- 0 until 60) yield {
        val text = (1 to 12).map(_ =>
          (1 to 4).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
          .mkString(" ")
        (li * 60L + i, text, lang)
      }).toDF("id", "text", "lang")
      val base = java.nio.file.Files.createTempDirectory("liddalert").toString
      val modelDir = s"$base/model"; val refDir = s"$base/ref"
      TextOps.writeLangIdModel(spark,
        TextOps.trainHashedLangId(docs, col("id"), col("text"), col("lang"),
          dim = 256, iters = 12), modelDir)
      TextOps.writeLangIdReference(docs, col("id"), col("text"), modelDir,
        refDir)
      // six resampled in-distribution batches (id % 6 — each a ~30-doc
      // subsample of the reference distribution) + one planted batch of
      // a single true language
      val inDist = docs.select(($"id" % 6).as("batch"), $"id", $"text")
      val planted = docs.filter($"lang" === "aa")
        .select(lit(99L).as("batch"), $"id", $"text")
      val out = TextOps.langIdDriftBatches(inDist.union(planted),
          col("id"), col("text"), col("batch"), modelDir, refDir, Tau)
        .select($"batch", $"n_docs", $"jsd", $"alert")
        .as[(Long, Long, Double, Boolean)].collect()
        .map(r => r._1 -> r).toMap
      assert(out.size == 7)
      val inRows = out.view.filterKeys(_ != 99L).values.toSeq
      // the calibration claim: sampling noise stays WELL under tau —
      // zero false positives across every resampled batch
      assert(inRows.forall(!_._4),
        s"false positive: ${inRows.filter(_._4)}")
      assert(inRows.map(_._3).max < Tau)
      // the planted single-language batch is far past tau
      assert(out(99L)._4, s"planted batch did not alert: ${out(99L)}")
      assert(out(99L)._3 > 0.2)
      // batch sizes are reported faithfully
      assert(inRows.map(_._2).sum == 180L && out(99L)._2 == 60L)
    } finally graft.CacheScope.drain()
  }
}
