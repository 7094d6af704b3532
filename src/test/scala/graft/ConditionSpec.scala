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
}
