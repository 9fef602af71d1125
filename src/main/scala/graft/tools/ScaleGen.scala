package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 derivation for the scaling audit (SCALE.md §sf1): the driver
  * ships sf0.001/0.01/0.1 only, so the 10× corpus is DERIVED from the
  * driver's sf0.1 by key-offset replication — `reps` copies of every
  * fact table with scaling keys offset by `rep * SPAN` (SPAN = 1e9, a
  * power of ten, so `key % 10`-style gate predicates keep their
  * per-replica meaning and replica key ranges can never collide with
  * gate-synthesized keys like upsert's +1e8 inserts). Fixed dims
  * (region, nation) stay as-is, TPC-H-style.
  *
  * Replication must not manufacture degeneracy the real corpus lacks:
  *  - documents: replica r > 0 suffixes every word with `~r`, so
  *    cross-replica shingle sets are disjoint — near-dup structure is
  *    10 independent copies of sf0.1's (linear), NOT 10-way duplicate
  *    clusters (which would blow the per-bucket verify up
  *    quadratically and measure the fixture, not the plan). n_chars is
  *    recomputed to keep the `n_chars = length(text)` invariant.
  *  - embeddings: replica r rotates the vector by 1 + (r-1) % 63
  *    positions, negating it on every second 63-cycle — both
  *    transforms preserve norms and within-replica geometry while
  *    cross-replica vectors stay as unrelated as the base corpus's
  *    near-orthogonal pairs (the cycle+sign form keeps replicas
  *    distinct past the 64-dim rotation period, up to 126 reps).
  *    Queries (vec_id < 5) and quantizer seeds
  *    (vec_id < 16) exist only in replica 0, so query count stays
  *    fixed while the corpus scales — the ANN gates' actual shape.
  *  - events: ts is kept verbatim (replicas overlay in time; user_ids
  *    are replica-distinct so sessions/funnels never merge) and stays
  *    int64 nanos, the same physical shape the driver ships.
  *
  * Output layout matches the driver's: ONE parquet file per table
  * (coalesce(1) + move), so ReplayStage's file copy and DuckDB's
  * read_parquet both work unchanged — but with 16 MB ROW GROUPS
  * (parquet.block.size): Spark's scan splits at row-group boundaries,
  * so a default-128MB-row-group 92 MB sf1 lineitem is ONE unsplittable
  * group and every scan above it runs on one core. The r10 sf10 probe
  * caught exactly that — group_agg read 5.9 s at sf1 (1 row group,
  * serial scan) vs 9.3 s at sf10 (7 groups, parallel): the sf1 "heavy
  * ratios" were fixture serialization, not thread saturation. Small
  * row groups make the derived fixtures scan-parallel the way real
  * multi-file corpora are; the driver's own sf0.1 files stay as
  * shipped.
  */
object ScaleGen {
  val SPAN = 1000000000L

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/root/repo/testdata_sf1")
    val reps = args.lift(2).map(_.toInt).getOrElse(10)
    // optional comma-list of tables to (re)generate, e.g. a probe slice
    val only: Option[Set[String]] = args.lift(3)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def writeSingle(df: DataFrame, name: String,
        blockSize: Long = 16L * 1024 * 1024): Unit = {
      if (only.exists(!_.contains(name))) return
      val tmp = java.nio.file.Files.createTempDirectory("g_scalegen")
      df.coalesce(1).write.mode(SaveMode.Overwrite)
        .option("parquet.block.size", blockSize.toString)
        .parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(sys.error(s"no parquet part for $name"))
      val out = java.nio.file.Paths.get(dst, s"$name.parquet")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.move(part, out,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      println(s"[scalegen] $name: ${java.nio.file.Files.size(out)} bytes")
    }

    def read(name: String) = spark.read.parquet(s"$src/$name.parquet")

    def replicate(df: DataFrame, keys: String*): DataFrame = {
      val withRep = df.crossJoin(
        spark.range(reps).select(col("id").as("__rep")))
      keys.foldLeft(withRep)((acc, k) =>
        acc.withColumn(k, col(k) + col("__rep") * SPAN))
    }

    writeSingle(read("region"), "region")
    writeSingle(read("nation"), "nation")
    writeSingle(replicate(read("customer"), "c_custkey")
      .drop("__rep"), "customer")
    writeSingle(replicate(read("supplier"), "s_suppkey")
      .drop("__rep"), "supplier")
    writeSingle(replicate(read("part"), "p_partkey")
      .drop("__rep"), "part")
    writeSingle(replicate(read("orders"), "o_orderkey", "o_custkey")
      .drop("__rep"), "orders")
    writeSingle(
      replicate(read("lineitem"), "l_orderkey", "l_partkey", "l_suppkey")
        .drop("__rep"), "lineitem")
    writeSingle(replicate(read("events"), "event_id", "user_id")
      .drop("__rep"), "events")
    writeSingle(replicate(read("documents"), "doc_id")
      .withColumn("text", when(col("__rep") === 0, col("text"))
        .otherwise(expr(
          """array_join(transform(split(text, ' '),
               w -> w || '~' || cast(__rep as string)), ' ')""")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("__rep"), "documents",
      // 2 MB row groups: the text-never-shuffles plan-locked paths
      // (span rewrite, exact dedup) parallelize ONLY through scan
      // splits — a 6.6 MB single-group sf1 documents file serializes
      // them with no plan-side fix available (spreading would shuffle
      // the text those plans exist to keep in place)
      blockSize = 2L * 1024 * 1024)
    // rotation amount cycles 1..63 (a 64-dim rotation by 64 is the
    // identity — reps > 64 would collide or hit slice(start=0)); the
    // second 63-cycle negates, keeping up to 126 replicas distinct
    writeSingle(replicate(read("embeddings"), "vec_id")
      .withColumn("__rot", expr(
        "cast(1 + (__rep - 1) % 63 as int)"))
      .withColumn("__sign", expr(
        "case when ((__rep - 1) div 63) % 2 = 1 then -1.0F else 1.0F end"))
      .withColumn("embedding", when(col("__rep") === 0, col("embedding"))
        .otherwise(expr(
          """transform(concat(slice(embedding, 65 - __rot, __rot),
                              slice(embedding, 1, 64 - __rot)),
                       x -> x * __sign)""")))
      .drop("__rep", "__rot", "__sign"), "embeddings")
    spark.stop()
  }
}
