package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print formatted physical plans for selected catalog queries
  * so scan pushdown / broadcast choice / codegen spans can be reviewed.
  * Usage: runMain graft.tools.ExplainRunner <sfDir> [query...]
  */
object ExplainRunner {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("filter", "group_agg", "join_inner", "join_broadcast",
        "window_rank", "dedup_minhash_pairs", "ann_bruteforce_topk",
        "embedding_neardup", "text_token_stats")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n########## $n ##########")
      graft.SparkEntry.queries.get(n) match {
        case Some(fn) =>
          try fn(spark, sfDir).explain("formatted")
          catch { case e: Exception =>
            println(s"explain failed: ${e.getMessage}") }
        case None => println("unknown query")
      }
    }
    spark.stop()
  }
}
