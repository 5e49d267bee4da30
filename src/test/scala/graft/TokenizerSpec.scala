package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tokenizer.Tokenizer

/** Frozen tokenizer rules (crawler/html_parser.hpp:135-147 +
  * index/index.h:122-176); these pin rank-identity for the whole engine.
  */
class TokenizerSpec extends AnyFunSuite {

  test("body tokens: lowercase, all-alpha only, < 20 chars, in order") {
    val content = "Quick brown FOX jumps42 over_the l4zy  dog " +
      "abcdefghijklmnopqrst abcdefghijklmnopqrs -"
    // jumps42 / over_the / l4zy / '-' dropped (non-alpha);
    // 20-char word dropped; 19-char word kept
    assert(Tokenizer.bodyTokens(content).toSeq ===
      Seq("quick", "brown", "fox", "dog", "abcdefghijklmnopqrs"))
  }

  test("empty / null / whitespace-only content") {
    assert(Tokenizer.bodyTokens("").isEmpty)
    assert(Tokenizer.bodyTokens(null).isEmpty)
    assert(Tokenizer.bodyTokens("  \t\n ").isEmpty)
  }

  test("title tokens: path split at non-letters, '#'-decorated, length incl '#' < 20") {
    // 19-letter segment: '#' + 19 = 20 -> dropped (index/index.h:127 counts the '#')
    val path = "src/Main0/abcdefghijklmnopqrs/Util.scala"
    assert(Tokenizer.titleTokens(path).toSeq ===
      Seq("#src", "#main", "#util", "#scala"))
    // raw count includes the length-dropped word (feeds numTitleWords)
    assert(Tokenizer.titleWordsRaw(path).length === 5)
  }

  test("postings: title first then body, 1-based, only kept tokens consume positions") {
    val ps = Tokenizer.postings("a/b.txt", "x y42 z")
    assert(ps.toSeq === Seq(("#a", 1L), ("#b", 2L), ("#txt", 3L), ("x", 4L), ("z", 5L)))
  }

  test("title string truncation at 50 chars with permanent stop") {
    val path = (1 to 12).map(i => "word" + ('a' + i % 3).toChar.toString).mkString("/")
    val t = Tokenizer.titleString(path)
    assert(t.length < 50)
    // 5-letter words + space = 6 chars each; check the reference rule:
    // append while curLen + wordLen < 50
    val words = Tokenizer.titleTokens(path).map(_.substring(1))
    var len = 0; val kept = words.takeWhile { w => val ok = len + w.length < 50; if (ok) len += w.length + 1; ok }
    assert(t === kept.mkString(" "))
  }

  test("abstract: skips first 5 raw body words, <100 chars, overflow stops permanently") {
    // 40 distinct 3-letter alpha words
    val words = (0 until 40).map(i => s"${('a' + i / 26).toChar}${('a' + i % 26).toChar}x")
    val a = Tokenizer.abstractString(words.mkString(" "))
    // i >= 5 => starts at index 5; 3+1 chars appended per word; append while
    // curLen + 3 < 100, curLen = 4k -> k <= 24 -> 25 words (indices 5..29)
    assert(a === words.slice(5, 30).mkString(" "))
    assert(a.length <= 100)
  }

  test("abstract: >=20-char words occupy a raw index slot but are not added") {
    val long = "a" * 25
    val content = s"$long b c d e f g"
    // raw indices: long=0 b=1 c=2 d=3 e=4 f=5 g=6 -> abstract = "f g"
    assert(Tokenizer.abstractString(content) === "f g")
  }

  test("docLength = kept title + kept body tokens") {
    val ps = Tokenizer.postings("x/y", "one two three")
    assert(ps.length === 5)
    assert(ps.last._2 === 5L)
  }

  test("tokenizeAll == the frozen single-purpose functions, field for field") {
    val long = "z" * 25
    val cases = Seq(
      ("a/doc.txt", "quick brown fox jumps the fence"),
      ("x/y", "one two three"),
      (s"$long/path.with-many_segments/AndCamelCase99", s"$long b c d e f g h42 i J K"),
      ("", ""),
      ("nopath", null),
      ((1 to 12).map(i => "word" + ('a' + i % 3).toChar.toString).mkString("/"),
        (0 until 40).map(i => s"${('a' + i / 26).toChar}${('a' + i % 26).toChar}x").mkString(" ")))
    cases.foreach { case (path, content) =>
      val t = Tokenizer.tokenizeAll(path, content)
      val m = Tokenizer.docMeta(path, content)
      assert(t.titleToks.toSeq === Tokenizer.titleTokens(path).toSeq, s"titleToks($path)")
      assert(t.bodyToks.toSeq === Tokenizer.bodyTokens(content).toSeq, s"bodyToks($path)")
      assert(t.title === m.title, s"title($path)")
      assert(t.summary === m.summary, s"summary($path)")
      assert(t.numTitleWords === m.numTitleWords, s"numTitleWords($path)")
      assert((t.titleToks.length + t.bodyToks.length).toLong === m.docLength, s"docLength($path)")
    }
  }
}
