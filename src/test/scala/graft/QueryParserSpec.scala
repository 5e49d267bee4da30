package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.query._

class QueryParserSpec extends AnyFunSuite {

  def parse(q: String): (Option[QOr], Vector[String]) = QueryParser.parseQuery(q)

  test("single word compiles to Or(And(Word))") {
    val (ast, flat) = parse("fox")
    assert(ast === Some(QOr(Vector(QAnd(Vector(QWord("fox")))))))
    assert(flat === Vector("fox"))
  }

  test("hidden AND: university of michigan") {
    val (ast, flat) = parse("university of michigan")
    assert(ast === Some(QOr(Vector(QAnd(Vector(
      QWord("university"), QWord("of"), QWord("michigan")))))))
    assert(flat === Vector("university", "of", "michigan"))
  }

  test("explicit AND variants") {
    for (q <- Seq("quick AND fox", "quick & fox", "quick && fox")) {
      val (ast, flat) = parse(q)
      assert(ast === Some(QOr(Vector(QAnd(Vector(QWord("quick"), QWord("fox")))))), q)
      assert(flat === Vector("quick", "fox"), q)
    }
  }

  test("OR variants") {
    for (q <- Seq("quick OR fox", "quick | fox", "quick || fox")) {
      val (ast, flat) = parse(q)
      assert(ast === Some(QOr(Vector(
        QAnd(Vector(QWord("quick"))), QAnd(Vector(QWord("fox")))))), q)
      assert(flat === Vector("quick", "fox"), q)
    }
  }

  test("phrase") {
    val (ast, flat) = parse("\"quick brown fox\"")
    assert(ast === Some(QOr(Vector(QAnd(Vector(
      QPhrase(Vector("quick", "brown", "fox"))))))))
    assert(flat === Vector("quick", "brown", "fox"))
  }

  test("hidden AND + phrase mix: Apollo Moon Landing \"Hello Earth\"") {
    val (ast, flat) = parse("Apollo Moon Landing \"Hello Earth\"")
    assert(ast === Some(QOr(Vector(QAnd(Vector(
      QWord("apollo"), QWord("moon"), QWord("landing"),
      QPhrase(Vector("hello", "earth"))))))))
    assert(flat === Vector("apollo", "moon", "landing", "hello", "earth"))
  }

  test("nesting + hidden AND: (quick OR brown) fox") {
    val (ast, flat) = parse("(quick OR brown) fox")
    assert(ast === Some(QOr(Vector(QAnd(Vector(
      QOr(Vector(QAnd(Vector(QWord("quick"))), QAnd(Vector(QWord("brown"))))),
      QWord("fox")))))))
    assert(flat === Vector("quick", "brown", "fox"))
  }

  test("filteredWord: punctuation stripped, case folded") {
    assert(QueryFilter.normalize("#Quick $fox%") === " quick  fox ")
    val (_, flat) = parse("#Quick $fox%")
    assert(flat === Vector("quick", "fox"))
  }

  test("filteredWord: glued operators destroyed (webServer.cpp:131-176)") {
    assert(QueryFilter.normalize("quick&& fox") === "quick   fox")
    assert(QueryFilter.normalize("quick &fox") === "quick  fox")
    assert(QueryFilter.normalize("quick && fox") === "quick && fox")
    assert(QueryFilter.normalize("quick|| fox") === "quick   fox")
    assert(QueryFilter.normalize("quick || fox") === "quick || fox")
    // glued parens
    assert(QueryFilter.normalize("Sky( x") === "sky  x")
    assert(QueryFilter.normalize("x )Sky") === "x  sky")
    assert(QueryFilter.normalize("(hello world)") === "(hello world)")
  }

  test("40-char truncation (config.h:25 + strncpy in indexServer.cpp:59-61)") {
    val long = ("word " * 20).trim // 99 chars
    val (_, flat) = parse(long)
    // 39 chars -> "word " x 7 + "word" (4) = 39 -> 8 words
    assert(flat.length === 8)
  }
}
