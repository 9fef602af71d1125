package graft.core

/** Function registry callable from `${f(...)}`, `func.`, `check.` and
  * `if=` sites. Mirrors the reference `easy_sql/sql_processor/funcs.py`:
  * name + first-paren-pair arg grammar (comma-split, no nested parens —
  * funcs.py:234-247, kept deliberately), per-param variable replacement,
  * and a seed of python-builtin-equivalent helpers (funcs.py:28-48).
  *
  * Funcs receive already-var-replaced params (possibly non-string when a
  * param was a single `${var}` reference) and return Any; `Coerce.truthy`
  * interprets results at condition sites.
  */
final class FuncRunner(initial: Map[String, Seq[Any] => Any] = Map.empty) {

  private var funcs: Map[String, Seq[Any] => Any] = initial

  def registerFuncs(fs: Map[String, Seq[Any] => Any]): Unit = funcs ++= fs
  def hasFunc(name: String): Boolean = funcs.contains(name)
  def funcNames: Iterable[String] = funcs.keys

  def runFunc(funcDef: String, varsReplacer: VarsContext): Any = {
    val (_, func, params) = parse(funcDef, varsReplacer)
    func(params)
  }

  def renderFuncCall(funcDef: String, varsReplacer: VarsContext): String = {
    val (name, _, params) = parse(funcDef, varsReplacer)
    s"$name(${params.map(Coerce.toStr).mkString(", ")})"
  }

  private def parse(funcDef: String, varsReplacer: VarsContext)
      : (String, Seq[Any] => Any, Seq[Any]) = {
    val open = funcDef.indexOf('(')
    if (open < 0) throw new SqlProcessorException(
      s"parse params failed for func definition: $funcDef")
    val name = funcDef.substring(0, open)
    val func = funcs.getOrElse(name, throw new SqlProcessorException(
      s"no function found for $funcDef in sql_processor"))
    val close = funcDef.indexOf(')')
    if (close < open) throw new SqlProcessorException(
      s"parse params failed for func definition: $funcDef")
    val raw = funcDef.substring(open + 1, close).trim
    val params: Seq[Any] =
      if (raw.isEmpty) Nil
      else raw.split(",", -1).toSeq.map(p =>
        varsReplacer.replaceVariablesAny(p.trim, includeFuncs = false))
    (name, func, params)
  }
}

object FuncRunner {

  /** Numeric-aware comparison: numbers compare numerically, otherwise
    * lexicographically (params arrive as strings from the ETL text). */
  private def cmp(a: Any, b: Any): Int = (num(a), num(b)) match {
    case (Some(x), Some(y)) => java.lang.Double.compare(x, y)
    case _ => Coerce.toStr(a).compareTo(Coerce.toStr(b))
  }

  private def num(v: Any): Option[Double] = v match {
    case i: Int => Some(i.toDouble)
    case l: Long => Some(l.toDouble)
    case d: Double => Some(d)
    case f: Float => Some(f.toDouble)
    case s: String => s.toDoubleOption
    case _ => None
  }

  private def f1(f: Any => Any): Seq[Any] => Any = { ps => f(ps.head) }
  private def f2(f: (Any, Any) => Any): Seq[Any] => Any =
    { ps => f(ps.head, ps(1)) }

  /** Equivalents of the python builtins/operator auto-import the reference
    * exposes (funcs.py:28-48) plus its own helpers (funcs.py:12-15). */
  def systemFuncs: Map[String, Seq[Any] => Any] = Map(
    "equal" -> f2((a, b) => Coerce.toStr(a) == Coerce.toStr(b)),
    "eq" -> f2((a, b) => Coerce.toStr(a) == Coerce.toStr(b)),
    "ne" -> f2((a, b) => Coerce.toStr(a) != Coerce.toStr(b)),
    "equal_ignore_case" -> f2((a, b) =>
      Coerce.toStr(a).equalsIgnoreCase(Coerce.toStr(b))),
    "is_greater_or_equal" -> f2((a, b) => cmp(a, b) >= 0),
    "lt" -> f2((a, b) => cmp(a, b) < 0),
    "le" -> f2((a, b) => cmp(a, b) <= 0),
    "gt" -> f2((a, b) => cmp(a, b) > 0),
    "ge" -> f2((a, b) => cmp(a, b) >= 0),
    "add" -> f2((a, b) => (num(a), num(b)) match {
      case (Some(x), Some(y)) => x + y
      case _ => Coerce.toStr(a) + Coerce.toStr(b)
    }),
    "sub" -> f2((a, b) => num(a).get - num(b).get),
    "mul" -> f2((a, b) => num(a).get * num(b).get),
    "truediv" -> f2((a, b) => num(a).get / num(b).get),
    "mod" -> f2((a, b) => num(a).get % num(b).get),
    "not_" -> f1(a => !Coerce.truthy(a)),
    "truth" -> (ps => ps.headOption.exists(Coerce.truthy)),
    "bool" -> (ps => ps.headOption.exists(Coerce.truthy)),
    "int" -> f1(a => num(a).get.toLong),
    "float" -> f1(a => num(a).get),
    "str" -> f1(Coerce.toStr),
    "len" -> f1(a => Coerce.toStr(a).length),
    "abs" -> f1(a => math.abs(num(a).get)),
    "max" -> (ps => ps.map(p => num(p).get).max),
    "min" -> (ps => ps.map(p => num(p).get).min)
  )
}
