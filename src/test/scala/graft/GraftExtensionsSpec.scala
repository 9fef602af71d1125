package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions install the minhash_md5 function builder") {
    // Full session-level behavior (builder.withExtensions) can't be
    // observed on the shared test session (getOrCreate returns the
    // existing one), so exercise the injection hook directly; the SQL
    // semantics of the underlying expression are covered by
    // MinHashMd5Spec's registration test.
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // applying twice must be idempotent-safe (cluster restarts re-apply)
    new GraftExtensions().apply(ext)
  }
}
