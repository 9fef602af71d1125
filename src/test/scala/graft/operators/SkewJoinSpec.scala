package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the hot-key-bounded salted skew join the hash oracle
  * (plain-join equality on uniform data) can't state: on CRAFTED skew
  * the hot key is detected, its fact rows spread over all S salts, the
  * dim replicates ONLY for hot keys, and the result is still
  * row-identical to the plain join. */
class SkewJoinSpec extends AnyFunSuite {

  private lazy val spark = graft.etl.TestSpark.spark

  test("hot key spreads over all salts; dim replicates only hot keys; " +
      "result equals the plain join") {
    import spark.implicits._
    val S = 4
    // 50% of the fact on key 7 (hot), the rest uniform over 100 keys
    val fact = spark.range(20000).select(
      when(col("id") % 2 === 0, lit(7L))
        .otherwise(pmod(col("id"), lit(100L)) + 100L).as("k"),
      col("id").as("v"))
    val dim = (Seq(7L) ++ (100L until 200L)).toDF("dk")
      .withColumn("payload", concat(lit("p"), col("dk")))

    // per-row identity salt (v is unique), same shape as the gate's
    // skewSalt over (l_orderkey, l_linenumber)
    val salt = pmod(xxhash64(col("k"), col("v")), lit(S.toLong))
      .cast("int")
    val joined = AdvancedOps.saltedSkewJoin(fact, dim, "k", "dk",
      salt, s = S, hotMin = 5000L)

    // identity with the plain join
    val got = joined.select("k", "v", "payload").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val want = fact.join(dim, col("k") === col("dk"))
      .select("k", "v", "payload").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got === want)
    assert(want.size === 20000)

    // the hot key's fact rows carry every salt value in [0, S)
    val hotSalts = joined.filter(col("k") === 7)
      .select("salt").distinct().collect().map(_.getInt(0)).sorted
    assert(hotSalts.sameElements(0 until S),
      s"hot key not spread over all salts: ${hotSalts.mkString(",")}")

    // cold keys stay unsalted (salt 0 only) — replication is bounded
    // by the hot set, not the dim size
    val coldSalts = joined.filter(col("k") =!= 7)
      .select("salt").distinct().collect().map(_.getInt(0))
    assert(coldSalts.sameElements(Array(0)),
      s"cold keys were salted: ${coldSalts.mkString(",")}")
  }

  test("uniform data (no hot keys) degenerates to the unsalted join") {
    import spark.implicits._
    val fact = spark.range(1000).select(
      pmod(col("id"), lit(50L)).as("k"), col("id").as("v"))
    val dim = (0L until 50L).toDF("dk").withColumn("payload", col("dk") * 2)
    val joined = AdvancedOps.saltedSkewJoin(fact, dim, "k", "dk",
      lit(99), s = 4, hotMin = 100L)
    // no key reaches hotMin → everything routes salt 0, nothing uses
    // the (deliberately poisoned) hot-salt expression
    assert(joined.select("salt").distinct().collect()
      .map(_.getInt(0)).sameElements(Array(0)))
    assert(joined.count() === 1000)
  }
}
