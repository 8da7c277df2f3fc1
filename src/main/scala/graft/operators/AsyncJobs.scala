package graft.operators

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap
import scala.concurrent.{ExecutionContext, Future}
import org.apache.spark.sql.DataFrame

/** Async job submit + poll — reference operator T14 (carto-etl
  * `etl/etl.py:166-173`: `regenerate_overviews()` returns a batch job id,
  * `check_job(id)` polls a status dict). Here the long-running work is a
  * Spark action driven by a Future; the handle exposes the same
  * submit/poll lifecycle.
  *
  * Job groups: each submission runs under a Spark job group tagged with
  * the job id so `cancel(id)` can stop the distributed work, not just
  * the driver thread.
  */
object AsyncJobs {
  sealed trait Status { def name: String }
  case object Pending extends Status { val name = "pending" }
  case object Running extends Status { val name = "running" }
  case object Done extends Status { val name = "done" }
  case class Failed(error: String) extends Status { val name = "failed" }

  private val jobs = new ConcurrentHashMap[String, Status]()

  /** Submit a body for async execution; returns the job id immediately. */
  def submit(spark: org.apache.spark.sql.SparkSession)(body: => Unit)(
      implicit ec: ExecutionContext = ExecutionContext.global): String = {
    val id = UUID.randomUUID().toString
    jobs.put(id, Pending)
    Future {
      jobs.put(id, Running)
      spark.sparkContext.setJobGroup(id, s"graft async job $id",
        interruptOnCancel = true)
      try { body; jobs.put(id, Done) }
      catch { case e: Throwable => jobs.put(id, Failed(e.getMessage)) }
      finally spark.sparkContext.clearJobGroup()
    }
    id
  }

  /** Poll a job's status — the `check_job` analog. Unknown id -> None. */
  def checkJob(id: String): Option[Status] = Option(jobs.get(id))

  def cancel(spark: org.apache.spark.sql.SparkSession, id: String): Unit =
    spark.sparkContext.cancelJobGroup(id)

  /** The reference's `regenerate_overviews()`: build the LOD pyramid for
    * a point table asynchronously, one parquet dir per zoom level. */
  def regenerateOverviews(points: DataFrame, lonCol: String, latCol: String,
      zooms: Seq[Int], outDir: String,
      valueCols: Seq[String] = Nil): String = {
    val spark = points.sparkSession
    submit(spark) {
      Overviews.pyramid(points, lonCol, latCol, zooms, valueCols)
        .foreach { case (z, df) =>
          df.write.mode("overwrite").parquet(s"$outDir/zoom=$z")
        }
    }
  }
}
