package graft.backend

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark

/** Fixture playing the user's UDF-holder object (the reference invokes
  * it as scala_udf_initializer via py4j; we call it directly). */
object SampleUdfHolder {
  def initUdfs(spark: SparkSession): Unit =
    spark.udf.register("init_udfs_double",
      org.apache.spark.sql.functions.udf((x: Int) => x * 2))
}

class InitUdfsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("scala_udf_initializer protocol resolves and registers") {
    new SparkBackend(spark).initUdfs("graft.backend.SampleUdfHolder")
    assert(spark.sql("select init_udfs_double(21)").collect()
      .head.getInt(0) == 42)
  }

  test("missing initializer reports a clear error") {
    intercept[graft.core.SqlProcessorException] {
      new SparkBackend(spark).initUdfs("java.lang.String")
    }
  }
}
