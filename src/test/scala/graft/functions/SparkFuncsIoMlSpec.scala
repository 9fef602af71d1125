package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.backend.SparkBackend
import graft.core.{FuncRunner, VarsContext}
import graft.etl.TestSpark

class SparkFuncsIoMlSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def runner(): (FuncRunner, VarsContext) = {
    val vc = new VarsContext()
    val r = new FuncRunner(FuncRunner.systemFuncs ++
      SparkFuncs.all(new SparkBackend(spark), vc))
    vc.init(r)
    (r, vc)
  }

  test("write_csv + rename_csv_output + write_json_local") {
    import spark.implicits._
    Seq((1, "a"), (2, "b")).toDF("id", "v")
      .createOrReplaceTempView("io_t")
    val (r, vc) = runner()
    val dir = java.nio.file.Files.createTempDirectory("graft_io").toString

    r.runFunc(s"write_csv(io_t, $dir/csv_out)", vc)
    r.runFunc(s"rename_csv_output($dir/csv_out, $dir/final.csv)", vc)
    val csv = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/final.csv")), "UTF-8")
    assert(csv.startsWith("id,v"))
    assert(csv.contains("1,a") && csv.contains("2,b"))

    r.runFunc(s"write_json_local(io_t, $dir/out.json)", vc)
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/out.json")), "UTF-8")
    assert(json.contains("\"id\":1") && json.contains("\"v\":\"b\""))
  }

  test("model_predict loads a Spark ML pipeline and re-registers the view") {
    import org.apache.spark.ml.Pipeline
    import org.apache.spark.ml.feature.VectorAssembler
    import org.apache.spark.ml.regression.LinearRegression
    import spark.implicits._

    // train y = 2x on a toy frame, persist the PipelineModel
    val train = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0), (4.0, 8.0))
      .toDF("x", "y")
    val pipeline = new Pipeline().setStages(Array(
      new VectorAssembler().setInputCols(Array("x")).setOutputCol("features"),
      new LinearRegression().setFeaturesCol("features").setLabelCol("y")))
    val model = pipeline.fit(train)
    val dir = java.nio.file.Files.createTempDirectory("graft_ml").toString
    model.write.overwrite().save(s"$dir/model")

    // int feature column: model_predict must cast int -> double
    Seq((1, 10), (2, 20)).toDF("id", "x")
      .withColumn("x", org.apache.spark.sql.functions.col("x"))
      .createOrReplaceTempView("ml_t")
    val (r, vc) = runner()
    r.runFunc(s"model_predict($dir/model, ml_t, id, x)", vc)

    val out = spark.table("ml_t")
    assert(out.columns.toSet == Set("x", "id", "prediction"))
    val preds = out.orderBy("id").collect().map(_.getDouble(2))
    assert(math.abs(preds(0) - 20.0) < 1e-6)
    assert(math.abs(preds(1) - 40.0) < 1e-6)
  }

  test("check_regex_func passes matches through, nulls the rest") {
    val f = Udfs.checkRegexFunc("[a-z]+@[a-z]+\\.com")
    assert(f("dev@corp.com") == "dev@corp.com")
    assert(f("dev@corp.com extra") == "dev@corp.com extra") // re.match: prefix
    assert(f("not-an-email") == null)
    assert(f(null) == null)

    Udfs.registerCheckRegex(spark, "check_email_spec", "[a-z]+@[a-z]+\\.com")
    val out = spark.sql(
      "select check_email_spec(c) as v from (values ('a@b.com'), ('nope')) " +
      "as t(c)").collect().map(_.getString(0))
    assert(out.toSeq == Seq("a@b.com", null))
  }
}
