package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark

/** The cross-engine gate: Spark partials → Derby ETL → readback must
  * agree exactly with a direct Spark aggregation of the same corpus —
  * loss anywhere in the handoff (ingest typing, rollup, save protocol,
  * readback typing) breaks equality. */
class EtlRdbGateSpec extends AnyFunSuite {

  private val d = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  test("the Derby-side report equals a direct Spark aggregation") {
    import org.apache.spark.sql.functions._
    val viaRdb = EtlOps.queries("etl_rdb_pipeline")(spark, d)
      .orderBy("lang").collect()
    val direct = Tables.documents(spark, d)
      .groupBy("lang")
      .agg(count("*").as("n_docs"), sum("n_chars").as("total_chars"))
      .withColumn("avg_chars",
        col("total_chars").cast("double") / col("n_docs").cast("double"))
      .orderBy("lang").collect()
    assert(viaRdb.length === direct.length)
    viaRdb.zip(direct).foreach { case (r, e) =>
      assert(r.getString(0) === e.getString(0))
      assert(r.getLong(1) === e.getLong(1))
      assert(r.getLong(2) === e.getLong(2))
      assert(r.getDouble(3) === e.getDouble(3)) // bit-exact: one division
    }
  }

  test("the gate is idempotent across invocations (fresh in-memory db)") {
    val a = EtlOps.queries("etl_rdb_pipeline")(spark, d)
      .orderBy("lang").collect().toSeq
    val b = EtlOps.queries("etl_rdb_pipeline")(spark, d)
      .orderBy("lang").collect().toSeq
    assert(a === b)
  }
}
