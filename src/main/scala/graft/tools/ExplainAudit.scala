package graft.tools

import org.apache.spark.sql.SparkSession

/** One-shot physical-plan audit for the round's new registry rows:
  * prints row counts plus any structurally-suspect operators
  * (cartesian products, nested-loop joins) in the executed plan.
  * Dev tool — PlanAuditSpec is the mechanical per-round gate. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val qs =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("q414_exif_orientation", "q415_hop_dial_trim",
        "q416_resample_dedup", "q417_vocab_prune",
        "q418_audio_gauntlet", "q419_index_takedown")
    for (q <- qs) {
      val df = graft.SparkEntry.queries(q)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      val bad = Seq("CartesianProduct", "BroadcastNestedLoopJoin")
        .filter(plan.contains)
      println(s"[audit] $q: rows=${df.count()} " +
        (if (bad.isEmpty) "plan-clean" else s"FLAGS=$bad"))
    }
    spark.stop()
  }
}
