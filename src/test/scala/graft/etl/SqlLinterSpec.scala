package graft.etl

import org.scalatest.funsuite.AnyFunSuite

class SqlLinterSpec extends AnyFunSuite {

  private def lint(sql: String, knownVars: Set[String] = Set.empty) =
    new SqlLinter(sql, knownVars).lint()

  test("clean reference-shaped ETL lints clean") {
    val sql = """-- backend: spark
-- target=variables
select 1 as a
-- target=template.dim
select id from source_t where id > #{lo}
-- target=temp.big
select * from (@{dim(lo=${a})}) t
-- target=check.has_rows
select count(1) as actual, 1 as expected from big
-- target=output.db.out
select * from big
"""
    val vs = lint(sql)
    assert(vs.isEmpty, vs.mkString("; "))
  }

  test("view referenced only inside a template body is not unused") {
    // the template is defined BEFORE `big` exists, so neither its own
    // body scan nor the output step's raw body (`@{reader}` only)
    // mentions a known view — only the output step's EXPANDED text
    // reads `big` (regression: the linter used to scan raw bodies only)
    val vs = lint("""-- backend: spark
-- target=template.reader
select id from big where id > 0
-- target=temp.big
select 1 as id
-- target=output.db.out
select * from (@{reader}) t
""")
    assert(!vs.exists(_.rule == "unused-target"), vs.mkString("; "))
  }

  test("view consumed only by func-style step args is not unused") {
    val vs = lint("""-- backend: spark
-- target=temp.probe_t
select 1 as id
-- target=check.ensure_no_null_cols_in_table(probe_t)
-- target=output.db.out, if=table_has_rows(probe_t)
select 1 as id
""")
    assert(!vs.exists(_.rule == "unused-target"), vs.mkString("; "))
  }

  test("a template DEFINITION alone does not mark its views as used") {
    // the template text mentions `lonely`, but no later step ever
    // instantiates it — `lonely` must still be reported unused (a
    // reference only counts when it appears in a step's expanded body)
    val vs = lint("""-- backend: spark
-- target=template.selfref
select * from lonely
-- target=temp.lonely
select 1 as id
-- target=output.db.out
select 1 as id
""")
    assert(vs.exists(v => v.rule == "unused-target" &&
      v.message.contains("lonely")), vs.mkString("; "))
  }

  test("syntax errors are caught by Catalyst's parser") {
    // note: Spark's grammar treats from/where/group as non-reserved, so
    // the broken SQL here is structurally broken (unbalanced call)
    val vs = lint("""-- backend: spark
-- target=temp.bad
select count( from x
-- target=output.db.o
select * from bad
""")
    assert(vs.exists(_.rule == "syntax"), vs.mkString("; "))
  }

  test("semantic rules: backend, target format, undefined refs, shapes") {
    val vs = lint("""-- backend: flink
-- target=temp.t1
select ${never_defined} as x
-- target=temp.t1
select @{nope} as y
-- target=check.weak
select 1 as one
-- target=output.no_db_part
select * from t1
-- target=log.empty_log
""")
    def rules = vs.map(_.rule).toSet
    assert(rules.contains("backend"))
    assert(rules.contains("undefined-variable"))
    assert(rules.contains("duplicate-target"))
    assert(rules.contains("undefined-template"))
    assert(rules.contains("check-shape"))
    assert(rules.contains("target-format"))
    assert(rules.contains("missing-sql"))
  }

  test("unused temp views are flagged; referenced ones are not") {
    val vs = lint("""-- backend: spark
-- target=temp.used
select 1 as a
-- target=temp.dead
select 2 as b
-- target=output.db.out
select * from used
""")
    assert(vs.exists(v => v.rule == "unused-target" &&
      v.message.contains("dead")))
    assert(!vs.exists(v => v.rule == "unused-target" &&
      v.message.contains("`used`")))
  }

  test("externally-provided vars and defaults are not false positives") {
    val sql = """-- backend: spark
-- target=temp.t
select '${ext}' as a, '${opt:fallback}' as b, ${f(1)} as c
-- target=output.db.o
select * from t
"""
    assert(lint(sql, knownVars = Set("ext")).isEmpty)
    assert(lint(sql).exists(_.rule == "undefined-variable"))
  }

  test("list_variables makes later variable refs data-driven, not errors") {
    val vs = lint("""-- backend: spark
-- target=list_variables
select 'x' as name_from_data
-- target=temp.t
select '${name_from_data}' as a
-- target=output.db.o
select * from t
""")
    assert(!vs.exists(_.rule == "undefined-variable"), vs.mkString("; "))
  }

  test("include/exclude rule filters") {
    val sql = "-- backend: flink\n-- target=temp.dead\nselect count( from\n"
    val all = new SqlLinter(sql).lint()
    assert(all.exists(_.rule == "syntax") && all.exists(_.rule == "backend"))
    val only = new SqlLinter(sql, includeRules = Some(Seq("syntax"))).lint()
    assert(only.nonEmpty && only.forall(_.rule == "syntax"))
    val excl = new SqlLinter(sql,
      excludeRules = Seq("syntax", "backend", "unused-target")).lint()
    assert(excl.isEmpty, excl.mkString("; "))
  }

  test("fix prepends a backend header and strips trailing whitespace") {
    val fixed = new SqlLinter("-- target=temp.t   \nselect 1 as a\n").fix()
    assert(fixed.startsWith("-- backend: spark\n"))
    assert(fixed.contains("-- target=temp.t\n"))
    // idempotent when the header exists
    val same = new SqlLinter(fixed).fix()
    assert(same == fixed)
  }

  test("bq-schema: unqualified tables lint on bigquery, clean on spark") {
    val body = """-- target=temp.t1
select id from raw_events
-- target=output.dw.out
with recent as (select * from dw.t2)
select r.id from recent r join ${temp_db}.t1 t on t.id = r.id
"""
    val onBq = lint("-- backend: bigquery\n" + body)
    val bq = onBq.filter(_.rule == "bq-schema")
    // exactly ONE unqualified reference: raw_events. The CTE `recent`
    // is local, `dw.t2` is qualified, `${temp_db}.t1` masks two-part.
    assert(bq.length === 1, onBq.mkString("; "))
    assert(bq.head.message.contains("`raw_events`"))
    assert(!onBq.exists(_.rule == "backend"),
      "bigquery is a supported backend (RDB dialect family)")

    val onSpark = lint("-- backend: spark\n" + body)
    assert(!onSpark.exists(_.rule == "bq-schema"),
      "bq-schema fired outside backend: bigquery")
  }

  test("bq-schema: CTE names are scoped to their With subtree — a bare " +
      "table sharing the name in an unrelated scope still lints") {
    // `x` is a CTE only INSIDE the derived table; the outer join reads
    // a real (unqualified) table that happens to share the name
    val body = """-- target=output.dw.out
select d.id
from (with x as (select 1 as id) select * from x) d
join x on x.id = d.id
"""
    val out = lint("-- backend: bigquery\n" + body)
      .filter(_.rule == "bq-schema")
    assert(out.length === 1, out.mkString("; "))
    assert(out.head.message.contains("`x`"))

    // and a scalar subquery's reference shares the enclosing scope
    val sub = """-- target=output.dw.out
with seen as (select 1 as id)
select (select max(id) from seen) as m from dw.base
"""
    assert(!lint("-- backend: bigquery\n" + sub)
      .exists(_.rule == "bq-schema"),
      "in-scope CTE referenced from a scalar subquery was flagged")

    // forward reference: a CTE body may see only PREVIOUSLY defined
    // siblings (non-recursive BigQuery WITH), so `late` inside `early`
    // is a bare table read, not a CTE hit
    val fwd = """-- target=output.dw.out
with early as (select id from late),
     late as (select 1 as id)
select * from early
"""
    val fwdOut = lint("-- backend: bigquery\n" + fwd)
      .filter(_.rule == "bq-schema")
    assert(fwdOut.length === 1, fwdOut.mkString("; "))
    assert(fwdOut.head.message.contains("`late`"))

    // ...while a backward reference between siblings stays clean
    val bwd = """-- target=output.dw.out
with early as (select 1 as id),
     late as (select id from early)
select * from late
"""
    assert(!lint("-- backend: bigquery\n" + bwd)
      .exists(_.rule == "bq-schema"),
      "backward sibling CTE reference was flagged")
  }

  test("repo example pipelines lint clean") {
    val dir = java.nio.file.Paths.get("examples")
    val files = java.nio.file.Files.list(dir).toArray.map(_.toString)
      .filter(_.endsWith(".sql"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val sql = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(f)), "UTF-8")
      val vs = new SqlLinter(sql).lint()
      assert(vs.isEmpty, s"$f: ${vs.mkString("; ")}")
    }
  }

  test("reference sample ETL lints with no syntax violations") {
    val path = "/root/reference/test/sample_etl.spark.sql"
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(path))) {
      val sql = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), "UTF-8")
      val vs = new SqlLinter(sql).lint()
      assert(!vs.exists(_.rule == "syntax"), vs.mkString("; "))
      assert(!vs.exists(_.rule == "backend"), vs.mkString("; "))
    }
  }
}
