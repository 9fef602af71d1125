package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark

class DataProfilerSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("profile fields: counts, nulls, distinct, min/max, mean, histogram") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(10.0), "a"), (2L, Some(20.0), "b"), (3L, Some(30.0), "a"),
      (4L, None, "a"), (5L, Some(50.0), "c"))
      .toDF("id", "score", "tag")
    val json = DataProfiler.profileJson(df, "t", includeCorrelations = true)

    assert(json.contains(""""rows": 5"""))
    // score: 4 non-null, 1 null, exact min/max, mean 27.5
    assert(json.contains(""""score": {"type": "double", "count": 4, "nulls": 1"""))
    assert(json.contains(""""min": "10.0""""))
    assert(json.contains(""""max": "50.0""""))
    assert(json.contains(""""mean": 27.5"""))
    // tag: top_values with multiplicities, 'a' x3 first
    assert(json.contains(""""top_values": [["a", 3]"""))
    // numeric correlations present (id vs score strictly increasing -> 1.0)
    assert(json.contains(""""id,score": 1.0"""))
    // numeric histogram is [bin, count] pairs
    assert(json.contains(""""histogram": [["""))
  }

  test("sampling caps rows and normalizes decimal/array/map/binary columns") {
    val df = spark.sql(
      """select id, cast(id as decimal(10,2)) as dec_c, array(id, id) as arr_c,
                map('k', id) as map_c, cast('x' as binary) as bin_c
         from range(1000)""")
    val s = DataProfiler.sampled(df, 100)
    val n = s.count()
    assert(n < 1000, s"expected a sampled subset, got $n")
    val types = s.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types("dec_c") == "double")
    assert(types.contains("arr_c__size") && types.contains("map_c__size"))
    assert(!types.contains("arr_c") && !types.contains("bin_c"))
  }

  test("report writes db/table.json and .html under the output folder " +
      "(reference funcs_common.py:398-412 naming)") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_profile").toString
    val df = Seq((1, "x"), (2, "y")).toDF("id", "v")
    val written = DataProfiler.report(df, "db1.t1", out, maxCount = 50000,
      includeCorrelations = false, types = Seq("html", "json"))
    assert(written.exists(_.endsWith("db1/t1.json")))
    assert(written.exists(_.endsWith("db1/t1.html")))
    val json = java.nio.file.Files.readString(
      java.nio.file.Paths.get(out, "db1", "t1.json"))
    assert(json.contains(""""rows": 2"""))
    assert(json.contains(""""correlations": null"""))
    // the HTML is a rendered report (per-column cards + bar charts),
    // not a JSON dump — the analog of the reference's ydata HTML
    val html = java.nio.file.Files.readString(
      java.nio.file.Paths.get(out, "db1", "t1.html"))
    assert(html.contains("<h2>id</h2>") && html.contains("<h2>v</h2>"))
    assert(html.contains("2 rows · 2 columns"))
    assert(html.contains("""class="bar""""))
    assert(html.contains("top values")) // string column chart
    assert(!html.contains("<pre"))
    intercept[graft.core.SqlProcessorException] {
      DataProfiler.report(df, "t", out, 10, false, Seq("pdf"))
    }
  }

  test("html report escapes content and renders correlations") {
    import spark.implicits._
    val df = Seq((1L, 2.0, "<b>&x"), (2L, 4.0, "y"))
      .toDF("id", "sc", "t<ag")
    val prof = DataProfiler.profile(df, "T <&> title",
      includeCorrelations = true)
    val html = DataProfiler.renderHtml(prof)
    assert(html.contains("T &lt;&amp;&gt; title"))
    assert(html.contains("&lt;b&gt;&amp;x"))
    assert(!html.contains("<b>&x"))
    assert(html.contains("correlations (Pearson)"))
    assert(html.contains("<td>1.000</td>")) // id vs sc strictly linear
  }

  test("data_profiling_report func runs the full reference signature") {
    spark.sql("select * from range(10)").createOrReplaceTempView("prof_src")
    val out = java.nio.file.Files.createTempDirectory("graft_profile2").toString
    val backend = new graft.backend.SparkBackend(spark)
    val vc = new graft.core.VarsContext()
    val runner = new graft.core.FuncRunner(SparkFuncs.all(backend, vc))
    vc.init(runner)
    runner.runFunc(
      s"data_profiling_report(prof_src, id < 8, $out, 50000, false, json)", vc)
    val json = java.nio.file.Files.readString(
      java.nio.file.Paths.get(out, "prof_src.json"))
    assert(json.contains(""""rows": 8"""))
    assert(json.contains(""""id": {"type": "bigint", "count": 8, "nulls": 0"""))
  }
}
