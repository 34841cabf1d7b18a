package graft.functions

import scala.collection.mutable.ListBuffer

/** Recursive-descent parser for Postgres array text literals.
  *
  * Behavior matches the reference engine's array grammar
  * (reference: lib/walex/casting/array_parser.ex:43-165):
  *
  *   - `{}` is the empty array; elements are comma-separated
  *   - unquoted `NULL` parses to a null element (array_parser.ex:66-72)
  *   - double-quoted elements may contain commas, braces and the escapes
  *     `\\` and `\"` (array_parser.ex:97-140)
  *   - arbitrary nesting `{{1,2},{3,4}}` via brace tracking
  *     (array_parser.ex:75-93,143-165)
  *   - quirk preserved: unquoted whitespace is part of the element
  *     (`{1, 2}` parses to `"1"`, `" 2"`)
  *   - quirk preserved: empty unquoted elements between commas are dropped
  *     (array_parser.ex:102-104)
  *
  * Elements are returned as `String` (or nested `List[Any]`, or `null`);
  * typed element casting is layered on top by [[PgTextCast]].
  */
object PgArrayParser {

  private final case class ParseFailure(msg: String) extends RuntimeException(msg)

  /** Parse a pg array literal. Left(error) on malformed input. */
  def parse(input: String): Either[String, List[Any]] = {
    if (input == null) return Left("null input")
    val s = input.trim
    if (s.isEmpty || s.charAt(0) != '{')
      return Left(s"expected '{' at start of array literal")
    try {
      val (arr, next) = parseArray(s, 0)
      var i = next
      while (i < s.length && s.charAt(i).isWhitespace) i += 1
      if (i != s.length) Left(s"unexpected trailing input at offset $i")
      else Right(arr)
    } catch {
      case ParseFailure(m) => Left(m)
    }
  }

  /** Parse, returning null on failure (never-throw lane used by the cast layer). */
  def parseOrNull(input: String): List[Any] = parse(input) match {
    case Right(a) => a
    case Left(_)  => null
  }

  // Precondition: s(pos) == '{'. Returns (elements, index after closing '}').
  private def parseArray(s: String, pos: Int): (List[Any], Int) = {
    var i = pos + 1
    val out = new ListBuffer[Any]
    while (true) {
      if (i >= s.length) throw ParseFailure("unterminated array: missing '}'")
      s.charAt(i) match {
        case '}' =>
          return (out.toList, i + 1)
        case ',' =>
          i += 1 // empty unquoted elements are dropped
        case '{' =>
          val (sub, next) = parseArray(s, i)
          out += sub
          i = afterElement(s, next)
        case '"' =>
          val (str, next) = parseQuoted(s, i)
          out += str
          i = afterElement(s, next)
        case _ =>
          val (raw, next) = parseUnquoted(s, i)
          if (raw.nonEmpty) out += (if (raw == "NULL") null else raw)
          i = next
      }
    }
    throw ParseFailure("unreachable")
  }

  // After a quoted string or sub-array the only legal continuations are
  // ',' (consumed) or '}' (left for the caller loop).
  private def afterElement(s: String, pos: Int): Int = {
    if (pos >= s.length) throw ParseFailure("unterminated array: missing '}'")
    s.charAt(pos) match {
      case ',' => pos + 1
      case '}' => pos
      case c   => throw ParseFailure(s"invalid character '$c' after element at offset $pos")
    }
  }

  // Precondition: s(pos) == '"'. Returns (unescaped string, index after closing quote).
  private def parseQuoted(s: String, pos: Int): (String, Int) = {
    val sb = new java.lang.StringBuilder
    var i = pos + 1
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' =>
          if (i + 1 >= s.length) throw ParseFailure("unterminated escape in quoted element")
          sb.append(s.charAt(i + 1))
          i += 2
        case '"' =>
          return (sb.toString, i + 1)
        case c =>
          sb.append(c)
          i += 1
      }
    }
    throw ParseFailure("unterminated quoted element")
  }

  // Unquoted element: runs until ',' or '}' (whitespace preserved).
  private def parseUnquoted(s: String, pos: Int): (String, Int) = {
    var i = pos
    while (i < s.length && s.charAt(i) != ',' && s.charAt(i) != '}') i += 1
    if (i >= s.length) throw ParseFailure("unterminated array: missing '}'")
    (s.substring(pos, i), i)
  }
}
