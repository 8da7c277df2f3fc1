package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis
import graft.operators.Dedup

/** Stage-by-stage profiling of the MinHash-LSH pipeline (temporary
  * diagnostic main). */
object Profile16 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpus = base
      .unionAll(base.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))
      .unionAll(base.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 20000).as("doc_id"),
          concat(col("text"), lit(" zz yy xx")).as("text")))

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    val sh = corpus.select(col("doc_id"),
      TextAnalysis.charShingles(col("text"), 4).as("__sh"))
    time("shingles")(sh.write.format("noop").mode("overwrite").save())

    val shCached = sh.persist()
    time("shingles+persist")(shCached.count())

    val bands = shCached.withColumn("__bands",
      Dedup.lshBandKeysFromShingles(col("__sh"), 4, 4))
      .select(col("doc_id"), col("__bands"))
    time("bands")(bands.write.format("noop").mode("overwrite").save())

    val bandsCached = bands.persist()
    time("bands+persist")(bandsCached.count())

    val pairs = Dedup.candidatePairs(bandsCached, "doc_id", "__bands")
    time("candidates")(println("  n=" + pairs.count()))

    val pairsCached = pairs.persist()
    pairsCached.count()
    val withSets = pairsCached
      .join(shCached.select(col("doc_id").as("id1"), col("__sh").as("__sh1")), "id1")
      .join(shCached.select(col("doc_id").as("id2"), col("__sh").as("__sh2")), "id2")
    val verified = withSets
      .withColumn("jaccard", Dedup.jaccard(col("__sh1"), col("__sh2")))
      .filter(col("jaccard") >= 0.5)
    time("verify-join")(println("  pairs=" + verified.count()))
    spark.stop()
  }
}
