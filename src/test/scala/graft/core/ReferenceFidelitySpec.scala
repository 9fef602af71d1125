package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference's own unit expectations
  * (easy_sql/sql_processor/context_test.py, easy_sql/utils/
  * sql_expr_test.py) — the substitution engine's trickiest cases.
  */
class ReferenceFidelitySpec extends AnyFunSuite {

  // --- TemplatesContext (context_test.py:8-51) ---------------------------

  test("template param values pass ${var} through for later replacement") {
    val tc = new TemplatesContext(Map("a" -> "xx\n#{var}=abc, 123"))
    assert(tc.replaceTemplates("??@{a(var=${abc})}??") ==
      "??xx\n${abc}=abc, 123??")
  }

  test("var-func in template parameters is not supported (left alone)") {
    val tc = new TemplatesContext(Map("a" -> "xx\n#{var}=abc, 123"))
    val replaced = tc.replaceTemplates("??@{a(var=${fn(abc)})}??")
    assert(replaced != "??xx\n${fn(abc)}=abc, 123??")
  }

  test("template references inside comments are not expanded") {
    val tc = new TemplatesContext(Map("a" -> "xx\n#{var}=abc, 123"))
    assert(tc.replaceTemplates(
      "??@{a(var=${abc})}?? --??@{a(var=${abc})}??") ==
      "??xx\n${abc}=abc, 123?? --??@{a(var=${abc})}??")
    assert(tc.replaceTemplates("-- ??@{a(var=${abc})}??") ==
      "-- ??@{a(var=${abc})}??")
  }

  test("multi-line template references") {
    val tc = new TemplatesContext(Map("a" -> "xx\n#{var}=abc, #{var1} 123"))
    assert(tc.replaceTemplates("??@{a(var=123\n,var1=234)}??") ==
      "??xx\n123=abc, 234 123??")
    assert(tc.replaceTemplates("??@{a(var=123,\nvar1=234)}??") ==
      "??xx\n123=abc, 234 123??")
    assert(tc.replaceTemplates("??@{a(\n  var\n=123\n,\nvar1=234)}??") ==
      "??xx\n123=abc, 234 123??")
  }

  test("template whose last line carries a comment gets a newline") {
    val tc = new TemplatesContext(
      Map("a" -> "--xx\n#{var}=abc, #{var1} 123--abc"))
    assert(tc.replaceTemplates("??@{a(var=123\n,var1=234)}??") ==
      "??--xx\n123=abc, 234 123--abc\n??")
    val tc2 = new TemplatesContext(Map("a" -> "\n#{var}=abc, #{var1} 123\n"))
    assert(tc2.replaceTemplates("??@{a(var=123\n,var1=234)}??") ==
      "??123=abc, 234 123??")
  }

  // --- VarsContext (context_test.py:54-95) -------------------------------

  private def vcOf(vars: Map[String, Any],
      funcs: Map[String, Seq[Any] => Any] = Map.empty): VarsContext = {
    val vc = new VarsContext(vars)
    vc.init(new FuncRunner(funcs))
    vc
  }

  test("recursive replacement, comments untouched, escaping ignored") {
    val vc = vcOf(Map("a" -> "##A##", "aa" -> "##${a}##"))
    assert(vc.replaceVariables("-${a}, ===${aa}===") ==
      "-##A##, ===####A####===")
    assert(vc.replaceVariables("-- -${a}, ===${aa}===") ==
      "-- -${a}, ===${aa}===")
    assert(vc.replaceVariables("-${a}, ==-- =${aa}===") ==
      "-##A##, ==-- =${aa}===")
    assert(vc.replaceVariables("-\\${a}, ===${aa}===") ==
      "-\\##A##, ===####A####===")

    val vc2 = vcOf(Map("a" -> "##A##", "b" -> "##${a}##",
      "aa" -> "##${b}##"))
    assert(vc2.replaceVariables("-${a}, -${b}, ===${aa}===") ==
      "-##A##, -####A####, ===######A######===")
  }

  test("func calls with literal, var, and defaulted args") {
    val f: Seq[Any] => Any = ps => Coerce.toStr(ps.head).toInt + 1
    val vc = vcOf(Map("a" -> "##A##", "aa" -> "##${a}##", "b" -> "1"),
      Map("f" -> f))
    assert(vc.replaceVariables("-${f(5)}, ===${aa}===") ==
      "-6, ===####A####===")
    assert(vc.replaceVariables("-${f(${b})}, ===${aa}===") ==
      "-2, ===####A####===")
    assert(vc.replaceVariables("-${f(${c:3})}, ===${aa}===") ==
      "-4, ===####A####===")
  }

  test("defaults used only when var missing") {
    val vc = vcOf(Map("a" -> "##A##", "b" -> "##${a}##", "aa" -> "##${b}##"))
    assert(vc.replaceVariables("-${a1:1}, -${b}, ===${aa:b?x}===") ==
      "-1, -####A####, ===######A######===")
  }

  // --- sql_expr_test.py edge cases ---------------------------------------

  test("quote closure with escapes and mixed quotes (sql_expr_test.py)") {
    assert(SqlText.isQuoteClosed("\"\""))
    assert(SqlText.isQuoteClosed("\"a\""))
    assert(SqlText.isQuoteClosed("\"'\""))
    assert(SqlText.isQuoteClosed("\"\\\"\""))       // "\""
    assert(SqlText.isQuoteClosed("\"\\\\\\\"\""))   // "\\\""
    assert(!SqlText.isQuoteClosed("\"\\\\\"\""))    // "\\""
    assert(SqlText.isQuoteClosed("''"))
    assert(SqlText.isQuoteClosed("'a'"))
    assert(SqlText.isQuoteClosed("'\"'"))
    assert(SqlText.isQuoteClosed("'\\''"))          // '\''
    assert(!SqlText.isQuoteClosed("'\\\\''"))       // '\\''
  }

  test("comment start positions (sql_expr_test.py:41-51)") {
    assert(SqlText.commentStart("--abc") == 0)
    assert(SqlText.commentStart("-abc") == -1)
    assert(SqlText.commentStart("---,abc") == 0)
    assert(SqlText.commentStart(" ---,abc") == 1)
    assert(SqlText.commentStart("\" -\"--,abc") == 4)
    assert(SqlText.commentStart("\" ---,abc") == -1)
    assert(SqlText.commentStart("' ---,abc") == -1)
    assert(SqlText.commentStart("' --'-,abc") == -1)
    assert(SqlText.commentStart("' -'--,abc") == 4)
    assert(SqlText.commentStart("' -''--',abc") == -1)
    assert(SqlText.commentStart("' -'--'--',abc") == 4)
  }

  test("semicolon removal cases (sql_expr_test.py:53-62)") {
    assert(SqlText.removeSemicolon("select 1; select 2") ==
      "select 1 select 2")
    assert(SqlText.removeSemicolon("select \"1;\" select 2") ==
      "select \"1;\" select 2")
    assert(SqlText.removeSemicolon("select --\"1;\" select 2") ==
      "select --\"1;\" select 2")
    assert(SqlText.removeSemicolon("select -\"1\";\"; select 2") ==
      "select -\"1\"\"; select 2")
    assert(SqlText.removeSemicolon(";;;") == "")
    assert(SqlText.removeSemicolon(";\n;;") == "\n")
    assert(SqlText.removeSemicolon(";  ") == "  ")
  }

  test("run_func empty/arg/var cases (sql_processor_test.py:358-366)") {
    val f1: Seq[Any] => Any = ps =>
      Coerce.truthy(ps(0)) && Coerce.truthy(ps(1))
    def run(call: String, vars: Map[String, Any] = Map.empty): Boolean = {
      val vc = vcOf(vars, Map("f1" -> f1))
      Coerce.truthy(vc.runner.get.runFunc(call, vc))
    }
    assert(!run("f1(,)"))
    assert(run("f1(1,1)"))
    assert(run("f1(1,${a})", Map("a" -> "1")))
    assert(!run("f1(1,${a})", Map("a" -> "")))
  }

  // --- step_test.py ports -------------------------------------------------

  test("step config edge cases (step_test.py:9-29)") {
    import graft.etl.StepConfig
    val c = StepConfig.fromConfigLine("-- target=check.f1(a, ${b})", 0)
    assert(c.stepType == "check" && c.name.contains("f1(a, ${b})"))
    // `,if=` without a space
    val c2 = StepConfig.fromConfigLine(
      "-- target=check.f1(a, ${b}),if=f2(c, ${d})", 0)
    assert(c2.condition.contains("f2(c, ${d})"))
    // malformed condition func name must be rejected
    intercept[SqlProcessorException] {
      StepConfig.fromConfigLine(
        "-- target=check.f1(a, ${b}),if=f2-(c, ${d})", 0)
    }
    intercept[SqlProcessorException] {
      StepConfig.fromConfigLine("-- target=unknown_type", 0)
    }
  }

  test("semicolon inside a string literal survives step split " +
      "(step_test.py:71-79)") {
    val steps = new graft.etl.StepFactory(Map.empty, None, None, false)
      .createFromSql("\n-- target=temp.test\nselect ';' as a\n        ")
    assert(steps.length == 1)
    assert(steps.head.targetConfig.exists(_.name.contains("test")))
    assert(steps.head.selectSql.exists(_.trim == "select ';' as a"))
  }

  test("comment substitutor round-trip on the reference's pathological sql") {
    val sql = """
select ${a}, ${b} -- ${a} in comment
, ',-- ' as c -- special comment
, ',--  as c -- something' -- special comment 1
, ",--  as c -- something" -- special comment 2 ${a}
, ',-- ' as c -- special comment
-- ${a} in comment
   ${a} -- some comment"""
    val cs = new CommentSubstitutor()
    assert(cs.recover(cs.substitute(sql)) == sql)
  }
}
