package graft.tokenizer

import graft.config.GraftConfig

/** The frozen tokenizer. These rules define rank-identity for the whole
  * engine, so they live in exactly one tested object and are shared by the
  * Spark build pipeline, the query-side scorer, and the single-threaded
  * oracle.
  *
  * Rules (from the reference):
  *  - body words: split content on whitespace; keep a word iff every char
  *    is an ASCII letter (crawler/html_parser.hpp:139-147), lowercase it;
  *    drop words with length >= 20 (index/index.h:155,
  *    configs/config.h:14 TOKEN_MAX_SIZE).
  *  - title words: the reference takes them from the HTML <title>; our
  *    input table (repo, path, commit, lang, content) has no title, so the
  *    title is the path split at non-letter boundaries (SURVEY.md §7.1).
  *    Title terms are '#'-decorated in the term dictionary
  *    (ranker/ranker.h:742-745); the length filter counts the '#'
  *    (index/index.h:127), so title words keep <= 18 letters.
  *  - positions: 1-based per document, title tokens first then body tokens
  *    (index/index.h:122-176 insertion order); only kept tokens consume a
  *    position (the reference's `continue` skips actualLocation++).
  */
object Tokenizer {

  private def isAllAlpha(s: String): Boolean = {
    if (s.isEmpty) return false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (!((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))) return false
      i += 1
    }
    true
  }

  /** Body tokens of a content string: kept tokens, lowercased, in order. */
  def bodyTokens(content: String): Array[String] = {
    if (content == null) return Array.empty
    val raw = content.split("\\s+")
    val out = new scala.collection.mutable.ArrayBuffer[String](raw.length)
    var i = 0
    while (i < raw.length) {
      val t = raw(i)
      if (isAllAlpha(t) && t.length < GraftConfig.TokenMaxSize)
        out += t.toLowerCase
      i += 1
    }
    out.toArray
  }

  /** Raw title words of a path: split at non-letter runs, lowercased,
    * BEFORE the length filter. The reference's numTitleWords counts the
    * parser-emitted title lines (index/index.h:107,116) which includes
    * words the indexer later drops for length, so this raw count is what
    * feeds numTitleWords and the title-rank denominator (ranker.h:668).
    */
  def titleWordsRaw(path: String): Array[String] = {
    if (path == null) return Array.empty
    path.split("[^A-Za-z]+").iterator
      .filter(_.nonEmpty).map(_.toLowerCase).toArray
  }

  /** Title tokens that enter the index: '#'-decorated, length(incl '#')
    * < 20 (index/index.h:127).
    */
  def titleTokens(path: String): Array[String] =
    titleWordsRaw(path).iterator
      .map("#" + _)
      .filter(_.length < GraftConfig.TokenMaxSize)
      .toArray

  /** Per-document posting stream: (term, localPos) with positions 1-based,
    * title tokens first (mirrors index/index.h:122-176). The document's
    * docLength is the number of entries returned (title kept + body kept),
    * matching the ##EndDoc delta - 1 (index/index.h:186-188,
    * constraintSolver/isr.h:151).
    */
  def postings(path: String, content: String): Array[(String, Long)] = {
    val title = titleTokens(path)
    val body = bodyTokens(content)
    val out = new Array[(String, Long)](title.length + body.length)
    var pos = 0
    while (pos < title.length) { out(pos) = (title(pos), pos + 1L); pos += 1 }
    var i = 0
    while (i < body.length) { out(pos) = (body(i), pos + 1L); pos += 1; i += 1 }
    out
  }

  /** All per-doc metadata in one tokenization pass (buildDocs hot path —
    * title string, abstract, raw title count, docLength).
    */
  case class DocMeta(title: String, summary: String, numTitleWords: Long,
                     docLength: Long)

  def docMeta(path: String, content: String): DocMeta = {
    val titleRaw = titleWordsRaw(path)
    val titleKept = titleRaw.iterator.map("#" + _)
      .filter(_.length < GraftConfig.TokenMaxSize).size
    val body = bodyWordsRaw(content)
    var bodyKept = 0
    // abstract + kept count in one sweep (index/index.h:150-167 rules)
    val sb = new StringBuilder
    var canAdd = true
    var curLen = 0
    var i = 0
    while (i < body.length) {
      val tok = body(i)
      if (tok.length < GraftConfig.TokenMaxSize) {
        bodyKept += 1
        if (canAdd) {
          if (curLen + tok.length < GraftConfig.MaxAbstractSize) {
            if (i >= 5) { sb.append(tok).append(' '); curLen += tok.length + 1 }
          } else canAdd = false
        }
      }
      i += 1
    }
    if (sb.nonEmpty) sb.setLength(sb.length - 1)
    DocMeta(titleString(path), sb.toString, titleRaw.length.toLong,
      (titleKept + bodyKept).toLong)
  }

  /** Title display string: kept title words joined by ' ', truncated at 50
    * chars with the reference's exact overflow rule
    * (index/index.h:128-139: stop permanently once a word would overflow;
    * `curTitleLength + wordLen < MAX_TITLE_SIZE` with the trailing space
    * overwritten at the end).
    */
  def titleString(path: String): String = {
    val sb = new StringBuilder
    var canAdd = true
    titleTokens(path).foreach { tok =>
      val word = tok.substring(1)
      if (canAdd) {
        if (sb.length + word.length < GraftConfig.MaxTitleSize) {
          sb.append(word).append(' ')
        } else canAdd = false
      }
    }
    if (sb.nonEmpty) sb.setLength(sb.length - 1)
    sb.toString
  }

  /** Everything the index build needs from one document, computed in ONE
    * sweep over the path and ONE sweep over the content: the kept token
    * streams ([[titleTokens]]/[[bodyTokens]]), the display title
    * ([[titleString]]), the abstract and raw-title count ([[docMeta]]).
    * docLength == titleToks.length + bodyToks.length (the kept counts).
    *
    * This exists so the combined bychunk build pass tokenizes each doc
    * exactly once; TokenizerSpec pins field-for-field equality with the
    * frozen single-purpose functions, which stay the definition of the
    * rules.
    */
  case class TokenizedDoc(titleToks: Array[String], bodyToks: Array[String],
                          title: String, summary: String, numTitleWords: Long)

  def tokenizeAll(path: String, content: String): TokenizedDoc = {
    // title sweep (rules of titleWordsRaw/titleTokens/titleString)
    val titleRaw = titleWordsRaw(path)
    val titleToks = new scala.collection.mutable.ArrayBuilder.ofRef[String]
    val tsb = new StringBuilder
    var tCanAdd = true
    var i = 0
    while (i < titleRaw.length) {
      val w = titleRaw(i)
      if (1 + w.length < GraftConfig.TokenMaxSize) {
        titleToks += ("#" + w)
        if (tCanAdd) {
          if (tsb.length + w.length < GraftConfig.MaxTitleSize) {
            tsb.append(w).append(' ')
          } else tCanAdd = false
        }
      }
      i += 1
    }
    if (tsb.nonEmpty) tsb.setLength(tsb.length - 1)
    // body sweep (rules of bodyTokens + docMeta's abstract loop: the
    // abstract index counts raw all-alpha words incl. the >=20-char ones)
    val raw = if (content == null) Array.empty[String] else content.split("\\s+")
    val bodyToks = new scala.collection.mutable.ArrayBuilder.ofRef[String]
    val sb = new StringBuilder
    var canAdd = true
    var curLen = 0
    var rawIdx = 0
    var j = 0
    while (j < raw.length) {
      val w = raw(j)
      if (isAllAlpha(w)) {
        val tok = w.toLowerCase
        if (tok.length < GraftConfig.TokenMaxSize) {
          bodyToks += tok
          if (canAdd) {
            if (curLen + tok.length < GraftConfig.MaxAbstractSize) {
              if (rawIdx >= 5) { sb.append(tok).append(' '); curLen += tok.length + 1 }
            } else canAdd = false
          }
        }
        rawIdx += 1
      }
      j += 1
    }
    if (sb.nonEmpty) sb.setLength(sb.length - 1)
    TokenizedDoc(titleToks.result(), bodyToks.result(), tsb.toString,
      sb.toString, titleRaw.length.toLong)
  }

  /** All-alpha (pre-length-filter) body words, lowercased. These are the
    * "lines" the reference's InputReader iterates: the crawler's parser
    * only emits all-alpha words, but words >= 20 chars still occupy a line
    * and an `i` slot before the indexer's `continue` drops them
    * (index/index.h:150-155).
    */
  def bodyWordsRaw(content: String): Array[String] = {
    if (content == null) return Array.empty
    content.split("\\s+").iterator
      .filter(isAllAlpha).map(_.toLowerCase).toArray
  }

  /** Abstract: body words with raw index >= 5, joined by ' ', with the
    * reference's exact overflow semantics (index/index.h:150-167): `i`
    * indexes the raw (pre-length-filter) word list; >=20-char words are
    * skipped but still advance `i`; the <100-chars check runs for every
    * kept token from i=0 (even the first five that are never appended) and
    * the first overflow stops appending permanently.
    */
  def abstractString(content: String): String = {
    val raw = bodyWordsRaw(content)
    val sb = new StringBuilder
    var canAdd = true
    var curLen = 0
    var i = 0
    while (i < raw.length) {
      val tok = raw(i)
      if (tok.length < GraftConfig.TokenMaxSize) {
        if (canAdd) {
          if (curLen + tok.length < GraftConfig.MaxAbstractSize) {
            if (i >= 5) {
              sb.append(tok).append(' ')
              curLen += tok.length + 1
            }
          } else canAdd = false
        }
      }
      i += 1
    }
    if (sb.nonEmpty) sb.setLength(sb.length - 1)
    sb.toString
  }
}
