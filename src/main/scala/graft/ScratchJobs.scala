package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Job/stage-count diagnostic: run named queries once warm and report
  * Spark job count, per-job planned task counts, and the slowest stages
  * (usage: runMain graft.ScratchJobs <name>[,...]). This is the audit
  * tool behind the r15 finding that d55/d50's fixture-scale walls are
  * ORCHESTRATION floors (29-34 tiny jobs, no stage over ~300 ms), not
  * data costs — the number to watch when a query's wall looks wrong but
  * its plan looks right.
  */
object ScratchJobs {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    @volatile var jobs = 0
    @volatile var stages = 0
    val stageLog = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long, Int)]
    val jobLog = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    val jobStartNs = scala.collection.mutable.Map.empty[Int, Long]
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs += 1
        jobStartNs(js.jobId) = System.nanoTime()
        val desc = Option(js.properties)
          .map(_.getProperty("spark.job.description", "")).getOrElse("")
        jobLog += ((js.jobId, desc.take(100), js.stageInfos.map(_.numTasks).sum))
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages += 1
        val si = sc.stageInfo
        val wall = (for { s <- si.submissionTime; c <- si.completionTime } yield c - s).getOrElse(-1L)
        stageLog += ((si.stageId, si.name.takeWhile(_ != '\n').take(80), wall, si.numTasks))
      }
    }
    spark.sparkContext.addSparkListener(l)
    for (name <- names) {
      // warm first
      SparkEntry.queries(name)(spark, sf).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      jobs = 0; stages = 0; stageLog.clear(); jobLog.clear()
      val t0 = System.nanoTime()
      spark.sparkContext.setJobDescription(s"audit: $name")
      SparkEntry.queries(name)(spark, sf).write.format("noop").mode("overwrite").save()
      spark.sparkContext.setJobDescription(null)
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      Thread.sleep(500) // let listener drain
      println(f"QUERY $name wall $dt%.2f s jobs $jobs stages $stages")
      jobLog.foreach { case (id, d, t) => println(f"  job $id%4d tasks $t%3d  $d") }
      stageLog.sortBy(-_._3).take(10).foreach { case (id, n, w, t) =>
        println(f"  stage $id%4d ${w}%6d ms tasks $t%3d  $n")
      }
    }
    spark.stop()
  }
}
