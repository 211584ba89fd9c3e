package graft.tools

import org.apache.spark.sql.SparkSession

import graft.core.GraftConfig
import graft.pipeline.{Audit, DedupPipeline}

/** Per-stage wall-time profile of one pipeline run (uses the audit ledger).
  * Usage: runMain graft.tools.ProfilePipeline <corpusDir> <cores>
  */
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val corpus = if (args.length > 0) args(0) else "/root/repo/target/bench-corpus"
    val cores = if (args.length > 1) args(1) else "32"
    val aqe = if (args.length > 2) args(2) else "true"
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    System.setProperty("graft.profile", "1")
    val images = spark.read.parquet(s"$corpus/images")
    // warm-up (JIT + page cache), then measured run — mirrors Bench.measure
    (1 to 2).foreach { round =>
      val t0 = System.nanoTime()
      val res = DedupPipeline.run(images, GraftConfig())
      val n = res.clusters.count()
      val total = (System.nanoTime() - t0) / 1e9
      println(f"RUN$round TOTAL $total%.1f s for $n rows (${n / total}%.0f rows/s), cc_iters=${res.ccIterations}")
      res.fingerprints.unpersist(); res.edges.unpersist(); res.clusters.unpersist()
    }
    spark.stop()
  }
}
