package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.core.GraftConfig
import graft.pipeline.{Candidates, Clustering, Fingerprints, Substring}

/** Per-OPERATOR task-time attribution at several core counts — the
  * round-4→5 question is WHICH operator's summed task time inflates going
  * 4→16 threads (the whole-pipeline ratio says "the engine", the stage
  * walls say "edges", this says which join). Each operator is timed as its
  * own action on a checkpointed fingerprint input, so per-mark task time is
  * exactly that operator's work.
  *
  * Usage: runMain graft.tools.OpProfile <corpusDir> [cores,cores] [shufflePartitions] [reps]
  */
object OpProfile {

  def main(args: Array[String]): Unit = {
    val corpus = args(0)
    val coreList = args.lift(1).getOrElse("4,16").split(",").map(_.trim.toInt).toSeq
    val parts = args.lift(2).map(_.toInt).getOrElse(0)
    val reps = args.lift(3).map(_.toInt).getOrElse(2)
    val cfg = GraftConfig()

    coreList.foreach { cores =>
      val builder = SparkSession.builder()
        .master(s"local[$cores]")
        .appName(s"graft-opprofile-$cores")
        .config("spark.sql.shuffle.partitions",
          (if (parts > 0) parts else cores).toString)
      // GRAFT_LOCAL_DIR: shuffle/spill dir override (e.g. /dev/shm tmpfs) —
      // isolates the virtio disk's concurrency behavior from engine scaling
      sys.env.get("GRAFT_LOCAL_DIR").foreach(d => builder.config("spark.local.dir", d))
      // GRAFT_ADVISORY_MB: AQE post-shuffle coalesce target (default 64m).
      // This — not shuffle.partitions — sets the real post-shuffle task
      // granularity, i.e. per-task sort/hash working-set size vs the L3.
      sys.env.get("GRAFT_ADVISORY_MB").foreach(m =>
        builder.config("spark.sql.adaptive.advisoryPartitionSizeInBytes", s"${m}m"))
      builder
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
      // GRAFT_SPARK_EXTRA: semicolon-separated key=value Spark confs — the
      // A/B attribution knob (e.g. task.cpus to fix concurrency at a pool
      // size, adaptive.enabled=false, parallelismFirst=false). Applied LAST
      // so it can override any default above.
      sys.env.get("GRAFT_SPARK_EXTRA").foreach(_.split(';').filter(_.contains('='))
        .foreach { kv =>
          val Array(k, v) = kv.split("=", 2)
          builder.config(k.trim, v.trim)
        })
      val spark = builder.getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val meter = new ScaleProbe.Meter
      spark.sparkContext.addSparkListener(meter)

      def mark(name: String, rep: Int)(f: => Long): Unit = {
        meter.reset()
        val t0 = System.nanoTime()
        val rows = f
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(400) // listener drain
        println(f"[op] cores=$cores rep=$rep $name%-22s wall=$wall%7.2fs " +
          f"task=${meter.taskMs.get() / 1000.0}%8.1f core-s " +
          f"cpu=${meter.cpuMs.get() / 1000.0}%8.1f core-s " +
          f"gc=${meter.gcMs.get() / 1000.0}%6.1fs rows=$rows " +
          f"jobs=${meter.jobs.get()}%3d stages=${meter.stages.get()}%3d " +
          f"tasks=${meter.tasks.get()}%5d " +
          f"shW=${meter.shuffleWriteBytes.get() / 1048576.0}%8.1fMB " +
          f"shR=${meter.shuffleReadBytes.get() / 1048576.0}%8.1fMB " +
          f"spill=${meter.diskSpilled.get() / 1048576.0}%6.1fMB " +
          f"peakMem=${meter.peakExecMem.get() / 1048576.0}%6.1fMB")
      }

      try {
        (1 to reps).foreach { rep =>
          val images = spark.read.parquet(s"$corpus/images")
          var fps: org.apache.spark.sql.Dataset[graft.model.FingerprintRow] = null
          mark("fingerprints", rep) {
            fps = Fingerprints.compute(images, cfg)
              .toDF().localCheckpoint(true).as[graft.model.FingerprintRow](
                org.apache.spark.sql.Encoders.product[graft.model.FingerprintRow])
            fps.count()
          }
          var sim: org.apache.spark.sql.DataFrame = null
          mark("simhash_pairs", rep) {
            sim = Candidates.simhashPairs(fps, cfg, cfg.sigmaHigh)
              .localCheckpoint(true)
            sim.count()
          }
          var band: org.apache.spark.sql.DataFrame = null
          mark("band_pairs", rep) {
            band = Candidates.bandPairs(fps, cfg).localCheckpoint(true)
            band.count()
          }
          var sub: org.apache.spark.sql.DataFrame = null
          mark("substring_pairs", rep) {
            sub = Substring.substringPairs(
              fps.toDF().select(col("image_id"), col("caption_norm"), col("span")), cfg)
              .localCheckpoint(true)
            sub.count()
          }
          var edges: org.apache.spark.sql.DataFrame = null
          mark("edges_union", rep) {
            import org.apache.spark.sql.functions._
            edges = sim.withColumn("source", lit("simhash"))
              .unionByName(band.withColumn("source", lit("minhash_band")))
              .unionByName(sub.withColumn("source", lit("substring")))
              .groupBy("a", "b").agg(min("source").as("source"))
              .localCheckpoint(true)
            edges.count()
          }
          mark("connected_components", rep) {
            Clustering.connectedComponents(fps.toDF().select("image_id"), edges)
              .labels.count()
          }
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        }
      } finally {
        spark.stop()
        System.gc(); Thread.sleep(1000); System.gc()
      }
    }
  }
}
