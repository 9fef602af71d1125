package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the MinHash-LSH dedup pipeline: times the full
  * sig -> band -> bucket-join -> Jaccard-verify path at 1x/3x/10x the
  * documents table. The claim under test: cost grows ~linearly with
  * corpus size (signatures are narrow passes; the only join is on band
  * buckets), unlike any all-pairs formulation.
  * Usage: runMain graft.tools.DedupProbe [sfDir]
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")

    def pairs(docs: DataFrame): Long = {
      val K = 8
      val sigs = docs
        .withColumn("toks", split(lower(trim(col("text"))), " "))
        .withColumn("shingles", expr(
          "transform(sequence(1, greatest(size(toks) - 1, 1)), " +
          "i -> concat_ws(' ', slice(toks, i, 2)))"))
        .withColumn("mh",
          graft.functions.MinHashMd5.minhash_md5(col("shingles"), K))
      val bands = sigs.select(col("doc_id"),
        explode(array((0 until K / 2).map(b =>
          struct(lit(b).as("band_id"),
            md5(concat(col("mh").getItem(2 * b),
                       col("mh").getItem(2 * b + 1))).as("band_hash"))
        ): _*)).as("band"))
        .select(col("doc_id"), col("band.band_id"), col("band.band_hash"))
        .persist()
      val cand = bands.as("a").join(bands.as("b"), Seq("band_id", "band_hash"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .filter(col("doc_a") < col("doc_b")).distinct()
      val sets = sigs.select(col("doc_id"),
        array_distinct(col("shingles")).as("sh"))
      val n = cand
        .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")),
          Seq("doc_a"))
        .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")),
          Seq("doc_b"))
        .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
        .filter(col("inter") * 5 >
          (size(col("sh_a")) + size(col("sh_b")) - col("inter")) * 4)
        .count()
      bands.unpersist()
      n
    }

    Seq(1, 3, 10).foreach { reps =>
      val docs = base.crossJoin(
          spark.range(reps).select(col("id").as("rep")))
        .select((col("doc_id") * reps + col("rep")).as("doc_id"),
                col("text"))
        .cache()
      val nd = docs.count()
      val t0 = System.nanoTime()
      val np = pairs(docs)
      println(f"docs=$nd%6d  near_dup_pairs=$np%8d  " +
        f"time=${(System.nanoTime() - t0) / 1e9}%.2f s")
      docs.unpersist()
    }
    spark.stop()
  }
}
