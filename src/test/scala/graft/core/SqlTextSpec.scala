package graft.core

import org.scalatest.funsuite.AnyFunSuite

class SqlTextSpec extends AnyFunSuite {

  test("quote closure detection") {
    assert(SqlText.isQuoteClosed("select 'a'"))
    assert(!SqlText.isQuoteClosed("select 'a"))
    assert(SqlText.isQuoteClosed("""select "a" from t"""))
    assert(!SqlText.isQuoteClosed("""select "a from t"""))
    assert(SqlText.isQuoteClosed("select '\\'' from t"))
    assert(SqlText.isQuoteClosed("no quotes at all"))
    assert(SqlText.isQuoteClosed("'a' and \"b\""))
    assert(!SqlText.isQuoteClosed("'a' and \"b"))
  }

  test("comment start is quote-aware") {
    assert(SqlText.commentStart("-- full comment") == 0)
    assert(SqlText.commentStart("select 1 -- c") == 9)
    assert(SqlText.commentStart("select '--' as a") == -1)
    assert(SqlText.commentStart("select '--' as a -- real") == 17)
    assert(SqlText.commentStart("select 1") == -1)
    // a dash run is not a comment token per the reference's [^-]-- scan
    assert(SqlText.commentStart("select 1 --- c") == -1 ||
           SqlText.commentStart("select 1 --- c") > 0)
  }

  test("semicolon removal respects quotes and comments") {
    assert(SqlText.removeSemicolonFromLine("select 1;") == "select 1")
    assert(SqlText.removeSemicolonFromLine("select ';' as a;") ==
      "select ';' as a")
    assert(SqlText.removeSemicolonFromLine("select 1 -- c;") ==
      "select 1 -- c;")
    assert(SqlText.removeSemicolon("select 1;\nselect 2;") ==
      "select 1\nselect 2")
  }

  test("comment substitution round-trips") {
    val sql = "select 1 -- a comment\n-- full line\nselect '--not' as a"
    val cs = new CommentSubstitutor()
    val masked = cs.substitute(sql)
    assert(!masked.contains("a comment"))
    assert(masked.contains("'--not'"))
    assert(cs.recover(masked) == sql)
  }

  test("substitute-then-recover is identity for arbitrary comment-bearing sql") {
    val gen = for {
      n <- org.scalacheck.Gen.choose(1, 6)
      ls <- org.scalacheck.Gen.listOfN(n, org.scalacheck.Gen.oneOf(
        "select 1 from t",
        "-- leading comment",
        "select 'x' as a -- trailing",
        "select ';' as semi",
        "where x = 'a--b'",
        ""))
    } yield ls.mkString("\n")
    (1 to 200).foreach { _ =>
      gen.sample.foreach { sql =>
        val cs = new CommentSubstitutor()
        assert(cs.recover(cs.substitute(sql)) == sql, s"failed for: $sql")
      }
    }
  }
}
