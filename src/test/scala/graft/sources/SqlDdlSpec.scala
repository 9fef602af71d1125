package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.TestSpark
import graft.operators.WriteOps.SnapshotTable

/** Catalog DDL: CREATE TABLE (empty v0 through the commit protocol),
  * CTAS (create + the SELECT as the v1 append), DROP TABLE, the
  * pt_year convention refusals, and the still-refused ALTER/RENAME. */
class SqlDdlSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val T = SnapshotTable

  private def freshCatalog(): (String, String) = {
    val base = Files.createTempDirectory("g_ddl_cat").toString
    val name = "gddl_" + java.util.UUID.randomUUID().toString.take(8)
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.base", base)
    (name, base)
  }

  test("CREATE TABLE births an empty v0; INSERT then DROP complete CRUD") {
    val (cat, base) = freshCatalog()
    spark.sql(
      s"CREATE TABLE $cat.t1 (k BIGINT, pt_year INT, v DOUBLE)")
    val root = s"$base/t1"
    assert(T.versions(root) === Seq(0))
    assert(T.files(root, 0).isEmpty)
    assert(spark.sql(s"SELECT count(*) AS c FROM $cat.t1")
      .collect().head.getLong(0) === 0)
    spark.sql(s"INSERT INTO $cat.t1 VALUES (1, 2023, 1.5)")
    assert(spark.sql(s"SELECT k FROM $cat.t1").collect()
      .head.getLong(0) === 1L)
    spark.sql(s"DROP TABLE $cat.t1")
    assert(T.versions(root).isEmpty)
    intercept[Exception](spark.sql(s"SELECT * FROM $cat.t1").collect())
  }

  test("CTAS lands the SELECT as v1 on the created empty v0") {
    import spark.implicits._
    val (cat, base) = freshCatalog()
    Seq((1L, 2023, 1.0), (2L, 2024, 2.0)).toDF("k", "pt_year", "v")
      .createOrReplaceTempView("ddl_src")
    spark.sql(s"CREATE TABLE $cat.t2 AS SELECT * FROM ddl_src")
    val root = s"$base/t2"
    assert(T.versions(root) === Seq(0, 1))
    assert(spark.sql(s"SELECT k FROM $cat.t2").collect()
      .map(_.getLong(0)).toSet === Set(1L, 2L))
    assert(T.pointers(root, 1).keySet === Set(2023, 2024))
  }

  test("schema without pt_year, PARTITIONED BY, duplicate create refuse") {
    val (cat, _) = freshCatalog()
    val e1 = intercept[Exception](spark.sql(
      s"CREATE TABLE $cat.t3 (k BIGINT, v DOUBLE)"))
    assert(e1.getMessage.contains("pt_year"))
    val e2 = intercept[Exception](spark.sql(
      s"CREATE TABLE $cat.t4 (k BIGINT, pt_year INT) " +
      "PARTITIONED BY (pt_year)"))
    assert(e2.getMessage.contains("convention"))
    spark.sql(s"CREATE TABLE $cat.t5 (k BIGINT, pt_year INT)")
    intercept[Exception](spark.sql(
      s"CREATE TABLE $cat.t5 (k BIGINT, pt_year INT)"))
    // the partition-key CONTRACT is enforced at DDL time: a STRING
    // pt_year would otherwise fail deep in the first append (getInt on
    // the partition column) with an opaque error
    val e3 = intercept[Exception](spark.sql(
      s"CREATE TABLE $cat.t5b (k BIGINT, pt_year STRING)"))
    assert(e3.getMessage.contains("pt_year must be INT"))
  }

  test("ALTER TABLE ADD COLUMN is a schema-bump commit; old files " +
      "null-fill; pre-evolution versions keep the old schema") {
    val (cat, base) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.ta (k BIGINT, pt_year INT)")
    spark.sql(s"INSERT INTO $cat.ta VALUES (1, 2023)")
    val root = s"$base/ta"
    val preFiles = T.files(root, 1)
    spark.sql(s"ALTER TABLE $cat.ta ADD COLUMN extra DOUBLE")
    // one empty commit: same data files, schema advanced
    assert(T.versions(root) === Seq(0, 1, 2))
    assert(T.files(root, 2) === preFiles,
      "ADD COLUMN touched data files")
    assert(T.tableSchema(root, 2).get.fieldNames.toSeq ===
      Seq("k", "pt_year", "extra"))
    // the pre-evolution file null-fills the new column by name
    assert(spark.sql(s"SELECT extra FROM $cat.ta").collect()
      .head.isNullAt(0))
    // an INSERT carrying the new column lands; old row stays null
    spark.sql(s"INSERT INTO $cat.ta VALUES (2, 2023, 7.5)")
    val rows = spark.sql(s"SELECT k, extra FROM $cat.ta").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(rows === Map(1L -> null, 2L -> 7.5))
    // VERSION AS OF the pre-evolution version serves the OLD schema
    assert(spark.sql(s"SELECT * FROM $cat.ta VERSION AS OF 1")
      .schema.fieldNames.toSeq === Seq("k", "pt_year"))
    // type changes / renames / drops keep refusing
    intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.ta DROP COLUMN extra"))
    intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.ta RENAME COLUMN extra TO extra2"))
    intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.ta ADD COLUMN extra DOUBLE")) // duplicate
  }

  test("ALTER COLUMN TYPE widens int→bigint / float→double; old files " +
      "upcast by name, pre-widen versions keep the old type") {
    import org.apache.spark.sql.types._
    val (cat, base) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t6 " +
      "(k BIGINT, pt_year INT, n INT, f FLOAT)")
    spark.sql(s"INSERT INTO $cat.t6 VALUES " +
      "(1, 2023, 7, CAST(1.5 AS FLOAT))")
    spark.sql(s"ALTER TABLE $cat.t6 ALTER COLUMN n TYPE BIGINT")
    spark.sql(s"ALTER TABLE $cat.t6 ALTER COLUMN f TYPE DOUBLE")
    // the widening is a pure schema-bump commit: no data files moved
    val root = s"$base/t6"
    assert(T.versions(root) === Seq(0, 1, 2, 3))
    assert(T.files(root, 3).toSet === T.files(root, 1).toSet)
    // new writes land at the wider type; old files upcast at read
    spark.sql(s"INSERT INTO $cat.t6 VALUES (2, 2024, 9, 2.5)")
    val df = spark.sql(s"SELECT k, n, f FROM $cat.t6 ORDER BY k")
    assert(df.schema("n").dataType === LongType)
    assert(df.schema("f").dataType === DoubleType)
    assert(df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ===
      Seq((1L, 7L, 1.5), (2L, 9L, 2.5)))
    // pre-widen versions serve the ORIGINAL types verbatim
    val v1 = spark.sql(s"SELECT n, f FROM $cat.t6 VERSION AS OF 1")
    assert(v1.schema("n").dataType === IntegerType)
    assert(v1.schema("f").dataType === FloatType)
    assert(v1.collect().map(r => (r.getInt(0), r.getFloat(1))).toSeq ===
      Seq((7, 1.5f)))
    // narrowing and the partition key refuse loudly
    intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.t6 ALTER COLUMN k TYPE INT"))
    val e = intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.t6 ALTER COLUMN pt_year TYPE BIGINT"))
    assert(e.getMessage.contains("partition key"))
  }

  test("RENAME keeps refusing; DROP of a non-table is false") {
    val (cat, base) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t6 (k BIGINT, pt_year INT)")
    intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.t6 RENAME TO t7"))
    val catalog = new SnapshotCatalog()
    catalog.initialize("x", new org.apache.spark.sql.util
      .CaseInsensitiveStringMap(java.util.Map.of("base", base)))
    assert(!catalog.dropTable(org.apache.spark.sql.connector.catalog
      .Identifier.of(Array.empty[String], "never_created")))
  }
}
