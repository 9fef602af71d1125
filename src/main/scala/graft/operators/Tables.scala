package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata star schema (TESTDATA.md).
  *
  * All catalog queries take `(SparkSession, sfDir)` and read parquet
  * directly — at cluster scale these would be catalog tables; the scan
  * path (vectorized parquet + pushdown + pruning) is identical.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The engine's content-stable hash bucket — the cross-engine
    * contract every sampling/split gate shares (DuckDB mirror:
    * `cast(('0x' || substr(md5(<key>), 1, 8)) as bigint) % mod`).
    * First 8 hex chars of md5 → non-negative 32-bit value → mod.
    * Single-sourced so a typo can't silently break engine parity in
    * one gate. */
  private[graft] def md5Bucket(key: org.apache.spark.sql.Column,
      mod: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long") % mod
  }

  def region(s: SparkSession, d: String): DataFrame   = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized reader
    * rejects; read nanos as long and truncate to micros (exactly what
    * DuckDB's ns→us cast does). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
  }
  /** Unique per-invocation suffix for session temp-view names: gates
    * that drop to SQL over temp views must not collide if two gates
    * (or two datasets) ever evaluate concurrently in one session, and
    * must not leak fixed names into the caller's catalog. */
  private val viewSeq = new java.util.concurrent.atomic.AtomicLong()
  private[graft] def invocationSuffix(): String =
    s"_i${viewSeq.incrementAndGet()}"

  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Exact money arithmetic: the synthetic prices/discounts are 2-decimal
    * doubles; casting each value to decimal(18,2) BEFORE aggregating makes
    * sums order-independent and bit-identical to the DuckDB oracle
    * (double sums are order-dependent and would flake the hash compare).
    * Final results are cast back to double so output schemas stay simple.
    */
  val dec = "decimal(18,2)"
}
