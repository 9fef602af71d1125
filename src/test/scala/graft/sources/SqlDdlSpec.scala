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
    intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.ta ADD COLUMN extra DOUBLE")) // duplicate
  }

  test("ALTER COLUMN RENAME is an O(1-manifest) name-mapping commit: " +
      "old files resolve by alias, VERSION AS OF keeps the old name") {
    val (cat, base) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.trn (k BIGINT, pt_year INT, v DOUBLE)")
    spark.sql(s"INSERT INTO $cat.trn VALUES (1, 2023, 1.5)")
    val root = s"$base/trn"
    val preFiles = T.files(root, 1)
    spark.sql(s"ALTER TABLE $cat.trn RENAME COLUMN v TO score")
    // pure schema bump: no data file moved
    assert(T.versions(root) === Seq(0, 1, 2))
    assert(T.files(root, 2) === preFiles, "RENAME touched data files")
    // the pre-rename file serves its DATA under the new name
    assert(spark.sql(s"SELECT score FROM $cat.trn").collect()
      .head.getDouble(0) === 1.5)
    // a post-rename write mixes with it under one schema
    spark.sql(s"INSERT INTO $cat.trn VALUES (2, 2023, 2.5)")
    assert(spark.sql(s"SELECT k, score FROM $cat.trn ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
      Seq((1L, 1.5), (2L, 2.5)))
    // filters on the renamed column stay exact across generations
    assert(spark.sql(
      s"SELECT k FROM $cat.trn WHERE score <= 2.0").collect()
      .map(_.getLong(0)).toSeq === Seq(1L))
    // VERSION AS OF a pre-rename version serves the OLD name verbatim
    val v1 = spark.sql(s"SELECT * FROM $cat.trn VERSION AS OF 1")
    assert(v1.schema.fieldNames.toSeq === Seq("k", "pt_year", "v"))
    assert(v1.collect().map(_.getDouble(2)).toSeq === Seq(1.5))
    // the old physical name is retired: re-adding it would resurrect
    // stale values from pre-rename files
    val e = intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.trn ADD COLUMN v DOUBLE"))
    assert(e.getMessage.contains("retired"))
    // chained rename keeps the whole alias chain readable
    spark.sql(s"ALTER TABLE $cat.trn RENAME COLUMN score TO points")
    assert(spark.sql(s"SELECT k, points FROM $cat.trn ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
      Seq((1L, 1.5), (2L, 2.5)))
    // pt_year stays immutable
    intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.trn RENAME COLUMN pt_year TO year"))
  }

  test("ALTER TABLE DROP COLUMN is a projection bump: files untouched, " +
      "the name retires, maintenance rewrites keep renamed data") {
    val (cat, base) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.tdr " +
      "(k BIGINT, pt_year INT, junk STRING, v DOUBLE)")
    spark.sql(
      s"INSERT INTO $cat.tdr VALUES (1, 2023, 'x', 1.5)")
    val root = s"$base/tdr"
    val preFiles = T.files(root, 1)
    spark.sql(s"ALTER TABLE $cat.tdr DROP COLUMN junk")
    assert(T.versions(root) === Seq(0, 1, 2))
    assert(T.files(root, 2) === preFiles, "DROP touched data files")
    assert(spark.sql(s"SELECT * FROM $cat.tdr").schema.fieldNames
      .toSeq === Seq("k", "pt_year", "v"))
    // VERSION AS OF pre-drop still serves the column
    assert(spark.sql(s"SELECT junk FROM $cat.tdr VERSION AS OF 1")
      .collect().head.getString(0) === "x")
    // re-ADD of the dropped name refuses (old files still carry it)
    val e = intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.tdr ADD COLUMN junk STRING"))
    assert(e.getMessage.contains("retired"))
    // rename + later maintenance rewrite: the REWRITE must carry the
    // renamed column's data (a by-name read would null it)
    spark.sql(s"ALTER TABLE $cat.tdr RENAME COLUMN v TO score")
    spark.sql(s"INSERT INTO $cat.tdr VALUES (2, 2023, 2.5)")
    T.optimize(spark, root, T.versions(root).max + 1)
    val rows = spark.sql(s"SELECT k, score FROM $cat.tdr ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows === Seq((1L, 1.5), (2L, 2.5)),
      "compaction after RENAME lost pre-rename column data")
  }

  test("DROP COLUMN IF EXISTS on a never-present column retires nothing: " +
      "a later ADD COLUMN of that name succeeds") {
    val (cat, base) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.tdrx (k BIGINT, pt_year INT, v DOUBLE)")
    spark.sql(s"INSERT INTO $cat.tdrx VALUES (1, 2023, 1.5)")
    // no data file ever carried 'ghost' — IF EXISTS passes the require
    // but must NOT land the name in the retired set
    spark.sql(s"ALTER TABLE $cat.tdrx DROP COLUMN IF EXISTS ghost")
    spark.sql(s"ALTER TABLE $cat.tdrx ADD COLUMN ghost STRING")
    spark.sql(s"INSERT INTO $cat.tdrx VALUES (2, 2023, 2.5, 'ok')")
    val rows = spark.sql(
      s"SELECT k, ghost FROM $cat.tdrx ORDER BY k").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(rows === Seq((1L, None), (2L, Some("ok"))))
    // a REAL drop still retires: mixing both in one statement keeps
    // the genuine column's name protected
    spark.sql(s"ALTER TABLE $cat.tdrx DROP COLUMN IF EXISTS v")
    val e = intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.tdrx ADD COLUMN v DOUBLE"))
    assert(e.getMessage.contains("retired"))
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
