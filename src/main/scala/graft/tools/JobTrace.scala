package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import graft.pipeline.DedupPipeline

/** Serial-floor attribution: per-job wall times AND inter-job driver gaps
  * for one pipeline run. F = sum(gaps) + sum(job wall − task/cores); the
  * trace names the poles. Usage: runMain graft.tools.JobTrace <corpus> [cores]
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val corpus = args.headOption.getOrElse("/root/repo/target/bench-corpus-120000")
    val cores = args.lift(1).getOrElse("4").toInt
    val builder = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-jobtrace")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.default.parallelism", "64")
    sys.env.get("GRAFT_LOCAL_DIR").orElse(Some("/dev/shm/graft-spark"))
      .filter(_.nonEmpty).foreach { d =>
        new java.io.File(d).mkdirs(); builder.config("spark.local.dir", d)
      }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class J(id: Int, start: Long, var end: Long = 0L, desc: String,
                       stages: Seq[Int])
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val stageAgg = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties).flatMap(p =>
            Option(p.getProperty("callSite.short")))).getOrElse("?")
        jobs.put(e.jobId, J(e.jobId, e.time, desc = desc,
          stages = e.stageIds.map(_.toInt)))
        ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach(_.end = e.time); ()
      }
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val m = i.taskMetrics
        stageAgg.put(i.stageId, (
          if (m != null) m.shuffleReadMetrics.totalBytesRead else 0L,
          if (m != null) m.shuffleWriteMetrics.bytesWritten else 0L,
          if (m != null) m.executorRunTime else 0L,
          i.name.take(60)))
        ()
      }
    })

    (1 to 2).foreach { rep =>
      jobs.clear()
      val images = spark.read.parquet(s"$corpus/images")
      val t0 = System.currentTimeMillis()
      val res = DedupPipeline.run(images, graft.core.GraftConfig())
      val n = res.clusters.count()
      val wall = System.currentTimeMillis() - t0
      Thread.sleep(500)
      if (rep == 2) { // warm rep only
        import scala.jdk.CollectionConverters._
        val js = jobs.values.asScala.toSeq.sortBy(_.start)
        var prevEnd = t0
        var gapTotal = 0L
        println(f"-- rep $rep wall=${wall / 1000.0}%.1f s rows=$n jobs=${js.size}")
        js.foreach { j =>
          val gap = j.start - prevEnd
          gapTotal += math.max(0L, gap)
          val st = j.stages.flatMap(id => Option(stageAgg.get(id)))
          val rd = st.map(_._1).sum / 1e6
          val wr = st.map(_._2).sum / 1e6
          val task = st.map(_._3).sum / 1000.0
          val names = j.stages.flatMap(id => Option(stageAgg.get(id)).map(_._4)).distinct
          println(f"job ${j.id}%3d wall=${(j.end - j.start) / 1000.0}%7.2f s gapBefore=${gap / 1000.0}%6.2f s task=${task}%7.1f cs shufR=${rd}%7.1fM shufW=${wr}%7.1fM  ${j.desc.take(40)} | ${names.mkString(";").take(80)}")
          prevEnd = math.max(prevEnd, j.end)
        }
        println(f"-- total inter-job gap=${gapTotal / 1000.0}%.1f s of ${wall / 1000.0}%.1f s wall")
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
