package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F2 row-level condition filter: compiles the reference's tiny boolean
  * grammar into a Catalyst `Column` — no custom Expression needed, the
  * whole predicate stays codegen-friendly.
  *
  * Grammar (semantics pinned against `src/common/expression/Expression.cpp:
  * 27-287` + `BoolValue.cpp`/`StringValue.cpp`):
  *   expr   := or
  *   or     := and ('||' and)*
  *   and    := cmp ('&&' cmp)*
  *   cmp    := unary (('==' | '!=') unary)?
  *   unary  := '!' unary | '(' expr ')' | atom
  *   atom   := '[' attr name ']' | '\'' string '\'' | ident | number
  * In the reference, identifier tokens come ONLY from bracketed `[x]`
  * (Expression.cpp buildTokens: IDENTIFIER starts at '['): `[op]` is the
  * DML op char i/u/d and `[true]`/`[false]` are the boolean constants
  * (Expression.cpp:239-247); any other `[x]` reads session attribute x
  * (evaluated per message at `DbTable::matchesCondition`). We match that
  * exactly, and additionally accept — as a DELIBERATE SUPERSET beyond the
  * reference (whose tokenizer errors on bare letters and whose evaluator
  * throws 50067 on NUMBER tokens) — bare identifiers (`op`, `true`,
  * `false`, attribute names) and numeric literals, which compare as their
  * canonical decimal string (session attributes are strings here).
  */
object Condition {

  sealed trait Ast
  case class Attr(name: String) extends Ast
  case class Lit(value: String) extends Ast
  case class Bool(value: Boolean) extends Ast
  case class Eq(l: Ast, r: Ast) extends Ast
  case class Ne(l: Ast, r: Ast) extends Ast
  case class Not(e: Ast) extends Ast
  case class And(l: Ast, r: Ast) extends Ast
  case class Or(l: Ast, r: Ast) extends Ast

  // ---- tokenizer ----
  sealed trait Tok
  private case class TAttr(n: String) extends Tok
  private case class TLit(v: String) extends Tok
  private case class TIdent(n: String) extends Tok
  private case object TEq extends Tok
  private case object TNe extends Tok
  private case object TNot extends Tok
  private case object TAnd extends Tok
  private case object TOr extends Tok
  private case object TLp extends Tok
  private case object TRp extends Tok

  private def tokenize(s: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer.empty[Tok]
    var i = 0
    while (i < s.length) {
      s(i) match {
        case c if c.isWhitespace => i += 1
        case '[' =>
          val j = s.indexOf(']', i)
          require(j > i, s"unterminated [attr] at $i in: $s")
          out += TAttr(s.substring(i + 1, j)); i = j + 1
        case '\'' =>
          val j = s.indexOf('\'', i + 1)
          require(j > i, s"unterminated string at $i in: $s")
          out += TLit(s.substring(i + 1, j)); i = j + 1
        case '=' =>
          require(i + 1 < s.length && s(i + 1) == '=', s"expected == at $i")
          out += TEq; i += 2
        case '!' =>
          if (i + 1 < s.length && s(i + 1) == '=') { out += TNe; i += 2 }
          else { out += TNot; i += 1 }
        case '&' =>
          require(i + 1 < s.length && s(i + 1) == '&', s"expected && at $i")
          out += TAnd; i += 2
        case '|' =>
          require(i + 1 < s.length && s(i + 1) == '|', s"expected || at $i")
          out += TOr; i += 2
        case '(' => out += TLp; i += 1
        case ')' => out += TRp; i += 1
        case c if c.isLetter || c == '_' =>
          var j = i
          while (j < s.length && (s(j).isLetterOrDigit || s(j) == '_')) j += 1
          out += TIdent(s.substring(i, j)); i = j
        case c if c.isDigit =>
          var j = i
          while (j < s.length && s(j).isDigit) j += 1
          out += TLit(s.substring(i, j)); i = j
        case c => throw new IllegalArgumentException(s"unexpected '$c' at $i in: $s")
      }
    }
    out.toList
  }

  // ---- recursive-descent parser ----
  def parse(s: String): Ast = {
    var toks = tokenize(s)
    def peek: Option[Tok] = toks.headOption
    def next(): Tok = { val t = toks.head; toks = toks.tail; t }

    def pOr(): Ast = {
      var l = pAnd()
      while (peek.contains(TOr)) { next(); l = Or(l, pAnd()) }
      l
    }
    def pAnd(): Ast = {
      var l = pCmp()
      while (peek.contains(TAnd)) { next(); l = And(l, pCmp()) }
      l
    }
    // `!` negates a whole comparison (boolean), not a string atom:
    // `![b] == 'y'` ≡ `!([b] == 'y')` — BoolValue has no string negation.
    def pCmp(): Ast = peek match {
      case Some(TNot) => next(); Not(pCmp())
      case _ =>
        val l = pUnary()
        peek match {
          case Some(TEq) => next(); Eq(l, pUnary())
          case Some(TNe) => next(); Ne(l, pUnary())
          case _ => l
        }
    }
    def pUnary(): Ast = next() match {
      case TLp =>
        val e = pOr()
        require(next() == TRp, "expected )")
        e
      case TAttr("true") => Bool(true)  // Expression.cpp:241-243
      case TAttr("false") => Bool(false)
      case TAttr(n) => Attr(n)
      case TLit(v) => Lit(v)
      case TIdent("true") => Bool(true)
      case TIdent("false") => Bool(false)
      case TIdent(n) => Attr(n) // bare identifier ≙ [n] (superset, see header)
      case t => throw new IllegalArgumentException(s"unexpected token $t")
    }

    val ast = pOr()
    require(toks.isEmpty, s"trailing tokens: $toks")
    ast
  }

  /** Compile to a Column over a message row: `[op]` reads `opCol`, other
    * attrs read `attrsCol[name]`. String equality treats a missing
    * attribute as "" (reference StringValue returns empty for unknown). */
  def compile(expr: String, opCol: Column = col("op"),
      attrsCol: Column = col("attrs")): Column = {
    def str(a: Ast): Column = a match {
      case Attr("op") => opCol
      case Attr(n) => coalesce(element_at(attrsCol, n), lit(""))
      case Lit(v) => lit(v)
      case other => throw new IllegalArgumentException(
        s"expected string operand, got $other")
    }
    def bool(a: Ast): Column = a match {
      case Eq(Bool(b), r) => bool(r) === lit(b)
      case Eq(l, Bool(b)) => bool(l) === lit(b)
      case Ne(Bool(b), r) => bool(r) =!= lit(b)
      case Ne(l, Bool(b)) => bool(l) =!= lit(b)
      case Eq(l, r) => str(l) === str(r)
      case Ne(l, r) => str(l) =!= str(r)
      case Not(e) => !bool(e)
      case And(l, r) => bool(l) && bool(r)
      case Or(l, r) => bool(l) || bool(r)
      case Bool(b) => lit(b)
      case other => throw new IllegalArgumentException(
        s"expected boolean expression, got $other")
    }
    if (expr == null || expr.trim.isEmpty) lit(true) else bool(parse(expr))
  }
}
