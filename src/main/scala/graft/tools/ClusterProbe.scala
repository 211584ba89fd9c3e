package graft.tools

import org.apache.spark.sql.SparkSession

import graft.pipeline.DedupPipeline

/** Multi-executor scaling probe: runs the dedup pipeline under Spark's
  * `local-cluster[numExecutors, coresPerExecutor, memMB]` master — separate
  * EXECUTOR JVM PROCESSES with their own heaps, GC, and code caches,
  * shuffling over the block-transfer service — the faithful single-box
  * proxy for the north_rule's "N and 4N executors" criterion. The
  * single-JVM `local[4N]` proxy conflates executor scaling with
  * in-process thread contention (measured: 16 threads in ONE JVM inflate
  * summed task time 1.4-1.7x vs 4 threads for identical work, capping any
  * raw wall ratio at ~0.6-0.7 no matter how well the engine scales);
  * 4 JVMs x 4 cores sidesteps exactly the contention a real 4-executor
  * cluster sidesteps, while still paying real serde + socket shuffle.
  *
  * Usage: runMain graft.tools.ClusterProbe <corpusDir> [execList] [coresPerExec] [reps]
  *   execList default "1,4" (N=1 executor vs 4N=4 executors), reps 2.
  *
  * Requires the packaged graft jar (sbt package) so executor JVMs can load
  * pipeline classes: passed via spark.jars.
  */
object ClusterProbe {

  def jarPath(): String = {
    val dir = new java.io.File("target/scala-2.13")
    // listFiles returns null when the directory doesn't exist — guard so the
    // intended "run sbt package" message is reached instead of an NPE
    Option(dir.listFiles((_, n) => n.startsWith("clonebasspark") && n.endsWith(".jar")))
      .getOrElse(Array.empty[java.io.File])
      .sortBy(_.lastModified()).lastOption
      .map(_.getAbsolutePath)
      .getOrElse(sys.error("run `sbt package` first — executors need the graft jar"))
  }

  /** One pipeline run at `nExec` executors x `coresPer` cores. */
  def run1(nExec: Int, coresPer: Int, memMb: Int, corpusDir: String): (Double, Long, Double, Double) = {
    val spark = SparkSession.builder()
      .master(s"local-cluster[$nExec,$coresPer,$memMb]")
      .appName(s"graft-cluster-$nExec")
      .config("spark.jars", jarPath())
      .config("spark.executor.memory", s"${memMb - 1024}m")
      .config("spark.sql.shuffle.partitions", (nExec * coresPer).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new ScaleProbe.Meter
    spark.sparkContext.addSparkListener(meter)
    try {
      // wait for executors to register so the measured wall excludes spin-up
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (spark.sparkContext.getExecutorMemoryStatus.size < nExec + 1 &&
             System.nanoTime() < deadline) Thread.sleep(200)
      val images = spark.read.parquet(s"$corpusDir/images")
      val t0 = System.nanoTime()
      val res = DedupPipeline.run(images, graft.core.GraftConfig())
      val n = res.clusters.count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener drain
      (wall, n, meter.taskMs.get() / 1000.0, meter.gcMs.get() / 1000.0)
    } finally {
      spark.stop()
      System.gc(); Thread.sleep(1500); System.gc()
    }
  }

  /** Wait (up to maxWaitSec) for hypervisor steal < 1% of capacity over a
    * 6 s sample — the box's interference waves (BENCH.md: bursts to 68%
    * steal) poison any leg that overlaps one.
    */
  def waitForCalm(maxWaitSec: Int): Unit = {
    def jiffies(): (Long, Long) = {
      val f = scala.io.Source.fromFile("/proc/stat").getLines().next()
        .trim.split("\\s+").drop(1).map(_.toLong)
      (f.take(3).sum + f.drop(5).take(2).sum, if (f.length > 7) f(7) else 0L)
    }
    val t0 = System.nanoTime()
    var calm = false
    while (!calm && (System.nanoTime() - t0) / 1e9 < maxWaitSec) {
      val (_, s0) = jiffies(); Thread.sleep(6000); val (_, s1) = jiffies()
      // steal as % of total vCPU capacity — busy-relative explodes at idle
      val capacity = Runtime.getRuntime.availableProcessors().toDouble * 100.0 * 6.0
      val steal = 100.0 * (s1 - s0) / capacity
      calm = steal < 1.0
      if (!calm) {
        println(f"[cluster] host steal $steal%.1f%% of vCPU capacity — waiting out the wave")
        Thread.sleep(10000)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val corpus = args(0)
    val execList = args.lift(1).getOrElse("1,4").split(",").map(_.trim.toInt).toSeq
    val coresPer = args.lift(2).map(_.toInt).getOrElse(4)
    val reps = args.lift(3).map(_.toInt).getOrElse(2)
    val memMb = args.lift(4).map(_.toInt).getOrElse(16384)
    val calmWait = args.lift(5).map(_.toInt).getOrElse(300)
    val best = scala.collection.mutable.LinkedHashMap[Int, Double]()
    execList.foreach { nExec =>
      (1 to reps).foreach { r =>
        waitForCalm(calmWait)
        val (wall, rows, task, gc) = run1(nExec, coresPer, memMb, corpus)
        println(f"[cluster] exec=$nExec%d x $coresPer cores run=$r wall=$wall%.1fs " +
          f"task=$task%.0f core-s gc=$gc%.0fs rows=$rows")
        best(nExec) = math.min(best.getOrElse(nExec, Double.MaxValue), wall)
      }
    }
    if (execList.size >= 2) {
      val n = execList.head; val n4 = execList.last
      val eff = (best(n) / best(n4)) / (n4.toDouble / n)
      println(f"[cluster] efficiency ${n}ex -> ${n4}ex (x${n4 / n}): $eff%.3f " +
        f"(walls ${best(n)}%.1f -> ${best(n4)}%.1f)")
    }
  }
}
