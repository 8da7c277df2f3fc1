package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Queries are materialized through the noop sink (not count()):
  * count() lets Catalyst prune computed columns, which would measure
  * scans instead of operators. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // JVM/codegen warmup on the smallest sf so per-query numbers measure
    // the query, not JIT + first-time codegen compilation
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // Jackson/json-expression class loading is its own first-use cost
    // (measured ~3-6 s landing on whichever query parses JSON first);
    // warm it with a one-row parse, untimed like the rest of warmup
    try {
      import org.apache.spark.sql.functions.{col, from_json, lit}
      spark.range(1)
        .select(from_json(lit("""{"k":1}"""),
          org.apache.spark.sql.types.StructType.fromDDL("k LONG")).as("j"))
        .select(col("j.k")).write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }
    // dev-only filter: SPARK_GRAFT_ONLY=q16,q32 times a subset; the
    // driver never sets it, so driver runs always measure everything
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // per-query isolation, OUTSIDE the timed section: release cached
      // plans and any persistent/localCheckpoint RDD blocks a query left
      // behind, so heap accumulation from one query can't charge a GC
      // burst to a later one (observed as a q27-q29 spike in round 2's
      // 53 GiB-heap driver run that never reproduced locally)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      name -> elapsed
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
