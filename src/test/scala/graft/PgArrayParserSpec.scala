package graft

import graft.functions.PgArrayParser
import org.scalatest.funsuite.AnyFunSuite

/** Grammar cases mirror the reference's array fixture matrix
  * (reference: test/walex/casting/array_parser_test.exs:1-95).
  */
class PgArrayParserSpec extends AnyFunSuite {

  private def ok(s: String): List[Any] =
    PgArrayParser.parse(s).fold(e => fail(s"parse failed: $e"), identity)

  test("empty array") { assert(ok("{}") == Nil) }

  test("simple ints") { assert(ok("{1,2,3}") == List("1", "2", "3")) }

  test("unquoted whitespace is preserved") {
    assert(ok("{1, 2}") == List("1", " 2"))
  }

  test("empty unquoted elements between commas are dropped") {
    assert(ok("{1,,2}") == List("1", "2"))
  }

  test("NULL handling") {
    assert(ok("{1,NULL,3}") == List("1", null, "3"))
    assert(ok("{NULL}") == List(null))
  }

  test("quoted strings with commas") {
    assert(ok("""{"book1, 2 and 3","book4"}""") == List("book1, 2 and 3", "book4"))
  }

  test("quoted escapes backslash and quote") {
    assert(ok("""{"hello, world","foo\\bar"}""") == List("hello, world", "foo\\bar"))
    assert(ok("""{"say \"hi\""}""") == List("say \"hi\""))
  }

  test("quoted NULL is the literal string") {
    assert(ok("""{"NULL"}""") == List("NULL"))
  }

  test("nested arrays") {
    assert(ok("{{1,2},{3,4}}") == List(List("1", "2"), List("3", "4")))
    assert(ok("{{{1,2}}}") == List(List(List("1", "2"))))
  }

  test("braces inside quotes are literal") {
    assert(ok("""{"{a,b}",c}""") == List("{a,b}", "c"))
  }

  test("errors: missing close brace") {
    assert(PgArrayParser.parse("{1,2").isLeft)
  }

  test("errors: unterminated quote") {
    assert(PgArrayParser.parse("""{"abc}""").isLeft)
  }

  test("errors: invalid char after quoted string") {
    assert(PgArrayParser.parse("""{"a"x,b}""").isLeft)
  }

  test("errors: not an array") {
    assert(PgArrayParser.parse("1,2,3").isLeft)
    assert(PgArrayParser.parse("").isLeft)
  }

  test("trailing garbage rejected") {
    assert(PgArrayParser.parse("{1}x").isLeft)
  }

  // property (seeded): arbitrary strings round-trip through pg quoting
  private def quote(e: String): String =
    "\"" + e.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  test("property: quoted round-trip (500 seeded cases)") {
    val rnd     = new scala.util.Random(42)
    val charset = "abcZ09,{} \\\"\t"
    for (_ <- 1 to 500) {
      val elems = List.fill(rnd.nextInt(6)) {
        new String(Array.fill(rnd.nextInt(12))(charset(rnd.nextInt(charset.length))))
      }
      val lit = elems.map(quote).mkString("{", ",", "}")
      assert(ok(lit) == elems, s"literal was: $lit")
    }
  }

  test("property: nested int arrays round-trip (200 seeded cases)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val rows = List.fill(rnd.nextInt(5) + 1)(List.fill(rnd.nextInt(5))(rnd.nextInt() % 1000000))
      val lit  = rows.map(_.mkString("{", ",", "}")).mkString("{", ",", "}")
      assert(ok(lit) == rows.map(_.map(_.toString)))
    }
  }

  test("property: arbitrary quoted strings/nulls/nesting round-trip (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // adversarial scalars: braces, commas, quotes, backslashes, NULL-the-word,
    // whitespace, unicode — all must survive the quote/escape/parse cycle
    val scalar: Gen[Any] = Gen.oneOf(
      Gen.const(null),
      Gen.oneOf("", "NULL", "a,b", "{", "}", "\\", "\"", "  ", "日本", "a\"b\\c"),
      Gen.asciiPrintableStr)
    def arrGen(depth: Int): Gen[List[Any]] =
      Gen.choose(0, 4).flatMap { n =>
        Gen.listOfN(n,
          if (depth == 0) scalar
          else Gen.frequency(4 -> scalar, 1 -> arrGen(depth - 1).map(x => x: Any)))
      }
    def render(l: List[Any]): String = l.map {
      case null         => "NULL"
      case s: String    => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      case sub: List[_] => render(sub.asInstanceOf[List[Any]])
    }.mkString("{", ",", "}")
    val prop = Prop.forAll(arrGen(2)) { arr =>
      PgArrayParser.parse(render(arr)) == Right(arr)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }
}
