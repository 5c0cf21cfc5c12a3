package graft.tools

import graft.{Engine, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev tool: run gates and print a per-Spark-job wall breakdown —
  * job count, per-job seconds, task counts, and the driver-side gaps
  * between jobs (fixture FS work, planning). Where a gate's seconds
  * go decides whether to optimize the plan, the job count, or the
  * driver path. args: sfDir gate [gate...] ; each gate runs twice
  * (cold then warm) and the warm run is the one broken down.
  */
object GateJobProfile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: GateJobProfile sfDir gate [gate...]")
    val dir = args.head
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("ERROR")
    val all = SparkEntry.queries ++ graft.queries.Pipeline.benchOnly

    case class Job(id: Int, desc: String, start: Long, stageIds: Set[Int],
        var end: Long = 0L, var tasks: Int = 0, var stages: Int = 0)
    val jobs = new scala.collection.mutable.ArrayBuffer[Job]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val d = Option(e.properties.getProperty("spark.job.description")).getOrElse("")
        jobs += Job(e.jobId, d, System.nanoTime(), e.stageIds.toSet)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.find(_.id == e.jobId).foreach(_.end = System.nanoTime())
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = jobs.synchronized {
        // attribute by stage id (jobs declare their stage ids at start) —
        // attribution by "most recent job" miscounts when jobs overlap
        // or a stage completes after its job ends
        val tgt = jobs.reverseIterator.find(_.stageIds.contains(e.stageInfo.stageId))
        tgt.foreach { j => j.stages += 1; j.tasks += e.stageInfo.numTasks }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      val df = all(name)(spark, dir)
      if (name.contains("_recall_")) df.collect()
      else df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    args.drop(1).foreach { name =>
      val cold = once(name)
      jobs.synchronized(jobs.clear())
      val g0 = System.nanoTime()
      val warm = once(name)
      val gEnd = System.nanoTime()
      Thread.sleep(200) // let listener events drain
      jobs.synchronized {
        println(f"==== $name  cold=${cold}%.2fs warm=${warm}%.2fs jobs=${jobs.size} ====")
        var prevEnd = g0
        var jobSum = 0.0; var gapSum = 0.0
        jobs.sortBy(_.start).foreach { j =>
          val gap = (j.start - prevEnd) / 1e9
          val dur = if (j.end > 0) (j.end - j.start) / 1e9 else -1.0
          if (dur >= 0) { jobSum += dur; gapSum += math.max(0, gap) }
          val desc = if (j.desc.length > 60) j.desc.take(60) else j.desc
          println(f"  job ${j.id}%4d gap=${gap}%6.3f dur=${dur}%6.3f stages=${j.stages}%2d tasks=${j.tasks}%4d $desc")
          prevEnd = math.max(prevEnd, j.end)
        }
        val tail = (gEnd - prevEnd) / 1e9
        println(f"  SUM jobs=${jobSum}%.2fs gaps=${gapSum}%.2fs tail=${tail}%.2fs of warm=${warm}%.2fs")
      }
    }
    spark.stop()
  }
}
