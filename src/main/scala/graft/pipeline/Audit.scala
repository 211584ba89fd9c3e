package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import java.nio.file.{Files, Paths}

/** Audit table + stage checkpointing (SURVEY.md §2.1 S6, §2.9).
  *
  * Replaces the reference's TCP progress/event side-channel
  * (/root/reference/EventClient.h:10-33, InfoStruct.h:16-236) with rows in a
  * parquet audit table (Iceberg-shaped; the runtime jar is absent in this
  * sandbox, so the `TableIO` seam is plain parquet dirs with atomic-rename
  * semantics via Spark's _SUCCESS commit marker — SURVEY.md §7.4).
  *
  * Resume semantics (north_rule "resumes from its last committed
  * checkpoint"): each stage writes its output under `<workDir>/<stage>/`;
  * a completed write leaves `_SUCCESS`. On rerun, a stage whose output is
  * committed is read back instead of recomputed — the analogue of the
  * reference's file-mask skip of already-fingerprinted headers
  * (/root/reference/Main.cpp:199-204,322-327).
  */
final class Audit(spark: SparkSession, workDir: String, runId: String) {
  import spark.implicits._

  private def auditPath = s"$workDir/audit"

  def log(stage: String, rowsOut: Long, wallMs: Long, committed: Boolean,
          detail: String = ""): Unit = {
    Seq(graft.model.AuditRow(runId, stage, rowsOut, wallMs, committed, detail))
      .toDF()
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(auditPath)
  }

  def auditRows(): DataFrame = spark.read.parquet(auditPath)

  private def isCommitted(stage: String): Boolean =
    Files.exists(Paths.get(s"$workDir/$stage/_SUCCESS"))

  /** Run-or-resume one stage. The compute closure is only invoked when the
    * stage has no committed output yet.
    */
  def stage(name: String)(compute: => DataFrame): DataFrame = {
    val path = s"$workDir/$name"
    if (isCommitted(name)) {
      log(name, -1L, 0L, committed = true, detail = "resumed: skipped committed stage")
      spark.read.parquet(path)
    } else {
      val t0 = System.nanoTime()
      val out = compute
      out.write.mode(SaveMode.Overwrite).parquet(path)
      val persisted = spark.read.parquet(path)
      val n = persisted.count()
      log(name, n, (System.nanoTime() - t0) / 1000000L, committed = true)
      persisted
    }
  }
}
