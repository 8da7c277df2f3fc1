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

    import org.apache.spark.sql.graftshim.ColumnBridge.{column => C, expression => E}
    val shingled = corpus.select(col("doc_id"),
      TextAnalysis.charShingles(col("text"), 4).as("__sh"))
    time("shingle noop warm0")(shingled.write.format("noop").mode("overwrite").save())
    time("shingle noop")(shingled.write.format("noop").mode("overwrite").save())
    val shp = shingled.persist()
    time("shingle persist")(shp.count())
    val prepared = shp.select(col("doc_id"),
      C(graft.expressions.MinHashBandsExpression(E(col("__sh")), 4, 4)).as("__bands"),
      C(graft.expressions.HashedShinglesExpression(E(col("__sh")))).as("__hs"),
      size(col("__sh")).as("__n"))
    time("prepared noop")(prepared.write.format("noop").mode("overwrite").save())
    val prep = prepared.persist()
    time("prepared persist")(prep.count())
    val pairs = Dedup.candidatePairs(prep.select(col("doc_id"), col("__bands")), "doc_id", "__bands")
    time("candidates")(println("  n=" + pairs.count()))
    val scored = pairs
      .join(prep.select(col("doc_id").as("id1"), col("__hs").as("__h1"), col("__n").as("__n1")), "id1")
      .join(prep.select(col("doc_id").as("id2"), col("__hs").as("__h2"), col("__n").as("__n2")), "id2")
      .filter(least(col("__n1"), col("__n2")).cast("double") / greatest(col("__n1"), col("__n2")) >= 0.5)
      .select(col("id1"), col("id2"),
        C(graft.expressions.SortedLongIntersectSizeExpression(E(col("__h1")), E(col("__h2")))).cast("double").as("__i"),
        col("__n1"), col("__n2"))
    time("verify noop")(scored.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
