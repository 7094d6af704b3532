package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.Condition
import graft.cdc.Condition._

/** F2 condition grammar: parser shape + semantics via the compiled Column
  * evaluated over literal rows (Expression.cpp:27-287 parity cases). */
class ConditionSpec extends AnyFunSuite {

  test("parses precedence: ! over == over && over ||") {
    assert(parse("[op] == 'i' && [a] != 'x' || ![b] == 'y'") ==
      Or(
        And(Eq(Attr("op"), Lit("i")), Ne(Attr("a"), Lit("x"))),
        Not(Eq(Attr("b"), Lit("y")))))
  }

  test("parens override precedence") {
    assert(parse("[op] == 'i' && ([a] == 'x' || [a] == 'y')") ==
      And(Eq(Attr("op"), Lit("i")),
        Or(Eq(Attr("a"), Lit("x")), Eq(Attr("a"), Lit("y")))))
  }

  test("attr names may contain spaces") {
    assert(parse("[client info] == 'x'") == Eq(Attr("client info"), Lit("x")))
  }

  test("rejects malformed input") {
    assertThrows[IllegalArgumentException](parse("[op] ="))
    assertThrows[IllegalArgumentException](parse("[op"))
    assertThrows[IllegalArgumentException](parse("[op] == 'i' extra["))
    assertThrows[IllegalArgumentException](compile("'lit' && 'lit2'") != null)
  }

  test("property: compiled Column ≡ direct AST interpretation") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import Condition._
    // drive scalacheck directly (scalatestplus bridge not in offline cache)
    def check(p: Prop): Unit = {
      val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
      assert(res.passed, res.status.toString)
    }

    val attrNames = Seq("a", "b", "client info")
    val values = Seq("", "x", "y", "i")
    val genLeaf: Gen[Ast] = Gen.oneOf(
      Gen.oneOf(attrNames :+ "op").map(Attr),
      Gen.oneOf(values).map(Lit))
    val genCmp: Gen[Ast] = for {
      l <- genLeaf; r <- genLeaf; eq <- Gen.oneOf(true, false)
    } yield if (eq) Eq(l, r) else Ne(l, r)
    // booleans only below !/&&/|| — bare string atoms are not booleans in
    // the grammar (BoolValue has no string truthiness)
    def genAst(depth: Int): Gen[Ast] =
      if (depth <= 0) genCmp
      else Gen.frequency(
        3 -> genCmp,
        1 -> genAst(depth - 1).map(Not),
        2 -> (for { l <- genAst(depth - 1); r <- genAst(depth - 1) } yield And(l, r)),
        2 -> (for { l <- genAst(depth - 1); r <- genAst(depth - 1) } yield Or(l, r)))

    def render(a: Ast): String = a match {
      case Attr(n) => s"[$n]"
      case Lit(v) => s"'$v'"
      case Eq(l, r) => s"(${render(l)} == ${render(r)})"
      case Ne(l, r) => s"(${render(l)} != ${render(r)})"
      case Not(e) => s"!${render(e)}"
      case And(l, r) => s"(${render(l)} && ${render(r)})"
      case Or(l, r) => s"(${render(l)} || ${render(r)})"
    }
    // the independent semantics: missing attr = "" (StringValue.cpp:35-58)
    def interp(a: Ast, op: String, attrs: Map[String, String]): Boolean = {
      def str(s: Ast): String = s match {
        case Attr("op") => op
        case Attr(n) => attrs.getOrElse(n, "")
        case Lit(v) => v
        case other => sys.error(s"non-string leaf $other")
      }
      a match {
        case Eq(l, r) => str(l) == str(r)
        case Ne(l, r) => str(l) != str(r)
        case Not(e) => !interp(e, op, attrs)
        case And(l, r) => interp(l, op, attrs) && interp(r, op, attrs)
        case Or(l, r) => interp(l, op, attrs) || interp(r, op, attrs)
        case other => sys.error(s"non-boolean root $other")
      }
    }

    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._

    val genCase = for {
      ast <- genAst(2)
      op <- Gen.oneOf("i", "u", "d")
      attrs <- Gen.mapOf(Gen.zip(Gen.oneOf(attrNames), Gen.oneOf(values)))
    } yield (ast, op, attrs)

    check(Prop.forAll(genCase) { case (ast, op, attrs) =>
      val expr = render(ast)
      // parse(render(ast)) must reproduce the ast (grammar roundtrip)...
      val reparsed = Condition.parse(expr)
      // ...and the compiled Column must agree with direct interpretation
      val df = Seq((op, attrs)).toDF("op", "attrs")
      val got = df.filter(Condition.compile(expr)).count() == 1
      got == interp(ast, op, attrs) && reparsed == ast
    })
  }

  test("compiled semantics over rows") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val df = Seq(
      ("i", Map("client info" -> "x")),
      ("d", Map("client info" -> "x")),
      ("u", Map.empty[String, String])).toDF("op", "attrs")
    def eval(e: String): Seq[String] =
      df.filter(Condition.compile(e)).select("op").collect().map(_.getString(0)).toSeq
    assert(eval("[op] != 'd' && [client info] == 'x'") == Seq("i"))
    assert(eval("[op] == 'u' || [client info] == 'x'") == Seq("i", "d", "u"))
    // missing attribute reads as empty string
    assert(eval("[client info] == ''") == Seq("u"))
    assert(eval("!([op] == 'd')") == Seq("i", "u"))
    assert(eval("") == Seq("i", "d", "u")) // empty condition = pass-all
  }

  test("bare identifiers, boolean constants, numbers (Expression.cpp:239-257)") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val df = Seq(
      ("i", Map("retries" -> "3", "flag" -> "on")),
      ("d", Map("retries" -> "0")),
      ("u", Map.empty[String, String])).toDF("op", "attrs")
    def eval(e: String): Seq[String] =
      df.filter(Condition.compile(e)).select("op").collect().map(_.getString(0)).toSeq
    // [true]/[false] are the reference's boolean constants
    // (Expression.cpp:239-247) — NOT session-attribute lookups
    assert(eval("[true]") == Seq("i", "d", "u"))
    assert(eval("[false]") == Seq())
    assert(eval("([op] == 'd') == [false]") == Seq("i", "u"))
    assert(eval("[true] && [op] != 'u'") == Seq("i", "d"))
    // the rest are the deliberate superset (bare idents / numbers)
    assert(eval("op == 'i'") == Seq("i")) // bare `op` ≙ [op]
    assert(eval("flag == 'on'") == Seq("i")) // bare ident ≙ [ident]
    assert(eval("[retries] == 3") == Seq("i")) // number ≙ decimal string
    assert(eval("true") == Seq("i", "d", "u"))
    assert(eval("false") == Seq())
    assert(eval("(op == 'd') == false") == Seq("i", "u"))
    assert(eval("true && op != 'u'") == Seq("i", "d"))
    // string operand against a boolean constant is a type error
    assertThrows[IllegalArgumentException](Condition.compile("[flag] == true"))
  }
}
