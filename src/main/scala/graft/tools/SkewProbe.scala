package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe: builds a 10x copy of lineitem with an injected hot key
  * (~50% of rows), then times plain vs salted two-stage aggregation and
  * reports per-reducer balance. Evidence for SCALE.md's skew claims at
  * a size where imbalance actually shows (6M rows, local[32]).
  * Usage: runMain graft.tools.SkewProbe [sfDir]
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false") // show raw skew
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    // 10x the data; half the copies collapse onto ONE hot key
    val big = base.crossJoin(spark.range(10).select(col("id").as("rep")))
      .withColumn("k",
        when(col("rep") < 5, lit(-1L)).otherwise(col("l_orderkey")))
      .select(col("k"), col("l_quantity")).cache()
    val n = big.count()
    println(s"rows=$n")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    time("plain groupBy") {
      big.groupBy("k").agg(sum("l_quantity")).write
        .format("noop").mode("overwrite").save()
    }
    time("salted two-stage") {
      big.withColumn("salt", pmod(monotonically_increasing_id(), lit(32)))
        .groupBy("k", "salt").agg(sum("l_quantity").as("p"))
        .groupBy("k").agg(sum("p")).write
        .format("noop").mode("overwrite").save()
    }
    // reducer balance for the plain shuffle: rows per hash partition
    val balance = big.withColumn("part", pmod(hash(col("k")), lit(32)))
      .groupBy("part").count().agg(max("count"), avg("count"))
      .as[(Long, Double)].collect().head
    println(f"plain shuffle balance: max=${balance._1} avg=${balance._2}%.0f " +
      f"(skew x${balance._1 / balance._2}%.1f)")

    // where salting actually matters: a shuffled JOIN on the hot key
    // (no partial aggregation to absorb the skew — one reducer gets
    // 50% of all rows). Dim is made big enough that Spark won't just
    // broadcast it.
    val dim = big.select("k").distinct()
      .withColumn("pad", lit("x" * 64))
    val salted = big.withColumn("salt",
      pmod(monotonically_increasing_id(), lit(32)).cast("int"))
    val dimX = dim.withColumn("salt",
      explode(array((0 until 32).map(lit): _*)))
    time("plain skewed join") {
      big.join(dim.hint("merge"), "k").write
        .format("noop").mode("overwrite").save()
    }
    time("salted skewed join") {
      salted.join(dimX.hint("merge"), Seq("k", "salt")).write
        .format("noop").mode("overwrite").save()
    }
    // reducer balance WITH the salt: the hot key's rows spread over 32
    // (k, salt) shuffle keys, so the max partition is bounded by
    // ~rows/32 + the benign tail — the "reducer-time bound" the salt
    // exists to provide when partials can't absorb the key
    val saltedBalance = salted
      .withColumn("part", pmod(hash(col("k"), col("salt")), lit(32)))
      .groupBy("part").count().agg(max("count"), avg("count"))
      .as[(Long, Double)].collect().head
    println(f"salted shuffle balance: max=${saltedBalance._1} " +
      f"avg=${saltedBalance._2}%.0f " +
      f"(skew x${saltedBalance._1 / saltedBalance._2}%.1f)")

    // AQE interplay: the runtime skew-join split is the FIRST answer at
    // scale (no dim replication); the manual salt must compose with it,
    // not fight it — measure both under AQE + skewJoin enabled
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    time("AQE skew-split plain join") {
      big.join(dim.hint("merge"), "k").write
        .format("noop").mode("overwrite").save()
    }
    time("AQE + salted join") {
      salted.join(dimX.hint("merge"), Seq("k", "salt")).write
        .format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
