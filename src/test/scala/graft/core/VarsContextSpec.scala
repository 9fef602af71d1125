package graft.core

import org.scalatest.funsuite.AnyFunSuite

class VarsContextSpec extends AnyFunSuite {

  private def ctx(vars: Map[String, Any] = Map.empty,
      funcs: Map[String, Seq[Any] => Any] = Map.empty): VarsContext = {
    val vc = new VarsContext(vars)
    vc.init(new FuncRunner(FuncRunner.systemFuncs ++ funcs))
    vc
  }

  test("simple var replacement, case-insensitive keys") {
    val vc = ctx(Map("A" -> "1", "b" -> "x"))
    assert(vc.replaceVariables("select ${a}, ${B}") == "select 1, x")
  }

  test("unknown var raises") {
    intercept[SqlProcessorException] {
      ctx().replaceVariables("select ${nope}")
    }
  }

  test("default values") {
    val vc = ctx(Map("a" -> "1"))
    assert(vc.replaceVariables("${a:9}") == "1")
    assert(vc.replaceVariables("${missing:9}") == "9")
    assert(vc.replaceVariables("x ${missing:def} y") == "x def y")
  }

  test("whole-string var returns raw value") {
    val vc = ctx(Map("n" -> 42))
    assert(vc.replaceVariablesAny("${n}") == 42)
    assert(vc.replaceVariables("v=${n}") == "v=42")
  }

  test("recursive resolution to fixpoint") {
    val vc = ctx(Map("a" -> "${b}", "b" -> "${c}", "c" -> "done"))
    assert(vc.replaceVariables("x ${a}") == "x done")
  }

  test("function calls with var args") {
    val vc = ctx(Map("a" -> "1"),
      Map("f1" -> (ps => ps.map(Coerce.toStr).mkString(""))))
    assert(vc.replaceVariables("${f1(${a}, 2)}, ${a}") == "12, 1")
  }

  test("vars in comments are not replaced") {
    val vc = ctx(Map("a" -> "1"))
    val out = vc.replaceVariables("select ${a} -- keep ${nope} here")
    assert(out == "select 1 -- keep ${nope} here")
  }

  test("func grammar: empty params and blank params") {
    val vc = ctx(funcs = Map(
      "f1" -> (ps => ps.map(Coerce.toStr).mkString(""))))
    val runner = new FuncRunner(FuncRunner.systemFuncs ++ Map(
      "f1" -> ((ps: Seq[Any]) => ps.map(Coerce.toStr).mkString(""))))
    assert(runner.runFunc("f1()", vc) == "")
    assert(runner.runFunc("f1(,)", vc) == "")
    assert(!Coerce.truthy(runner.runFunc("bool()", vc)))
  }

  test("system funcs: comparisons are numeric-aware") {
    val vc = ctx(Map("a" -> "10", "b" -> "9"))
    val r = new FuncRunner(FuncRunner.systemFuncs)
    assert(r.runFunc("is_greater_or_equal(${a}, ${b})", vc) == true)
    assert(r.runFunc("equal(1, 1)", vc) == true)
    assert(r.runFunc("equal_ignore_case(AbC, abc)", vc) == true)
  }

  test("render func call") {
    val vc = ctx(Map("a" -> "7"))
    val r = new FuncRunner(FuncRunner.systemFuncs)
    assert(r.renderFuncCall("equal(${a}, 7)", vc) == "equal(7, 7)")
  }
}
