package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage profiling of registry queries (diagnostic main, r12
  * optimization round): runs the named queries through the bench's
  * noop-sink methodology and prints one line per completed stage —
  * task count, summed executor run time, stage wall — so a slow row
  * can be attributed to a specific exchange/aggregate instead of a
  * whole query. Usage:
  *   runMain graft.tools.StageProbe <sfDir> <query> [query ...]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // match the Bench/Verify session exactly — without this, every
      // persist() materializes at the static partition count and the
      // probe's stage tables stop matching what the bench executes
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHE_AQE", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class St(id: Int, name: String, tasks: Int, runMs: Long,
      wallMs: Long, shufReadMb: Double, shufWriteMb: Double,
      outRows: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(
          sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages.add(St(si.stageId,
          si.name.split('\n').head.take(70), si.numTasks,
          m.executorRunTime,
          (si.completionTime.getOrElse(0L) -
            si.submissionTime.getOrElse(0L)).max(0L),
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          m.outputMetrics.recordsWritten))
      }
    })

    // same warmup as Bench so JIT/codegen costs don't land on stage 0
    try graft.SparkEntry.entry(spark)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    names.foreach { n =>
      stages.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"\n===== $n wall=$wall%.2f s =====")
      println(f"${"stage"}%6s ${"tasks"}%5s ${"runS"}%8s ${"wallS"}%7s " +
        f"${"shRdMB"}%7s ${"shWrMB"}%7s  name")
      import scala.jdk.CollectionConverters._
      stages.asScala.toSeq.sortBy(_.id).foreach { s =>
        println(f"${s.id}%6d ${s.tasks}%5d ${s.runMs / 1e3}%8.2f " +
          f"${s.wallMs / 1e3}%7.2f ${s.shufReadMb}%7.1f " +
          f"${s.shufWriteMb}%7.1f  ${s.name}")
      }
      val totRun = stages.asScala.map(_.runMs).sum / 1e3
      val totTasks = stages.asScala.map(_.tasks).sum
      println(f"TOTAL stages=${stages.size}%d tasks=$totTasks%d " +
        f"run=$totRun%.2f s wall=$wall%.2f s")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
