package graft.isr

import graft.config.GraftConfig

/** Faithful Scala port of the reference's ISR (index stream reader)
  * machinery, constraintSolver/isr.h. Operates over decoded flat location
  * arrays per chunk (SURVEY.md §1.1: our (docId, pos) model is converted
  * back to the reference's single location space inside the scorer, so
  * span heuristics and doc-boundary semantics match exactly).
  *
  * Faithfulness notes:
  *  - Exhausted word ISRs report startLocation = 0xFFFFFFFF (isr.h:15).
  *  - Seek honors the sync-table stripe jump (isr.h:83-91): if the
  *    target's `loc >> 20` stripe has a first posting, decoding restarts
  *    there *even if that moves backward*; when the stripe has no entry,
  *    the scan proceeds forward from the current position (which can
  *    leave the cursor past the target — observable and intentional).
  *  - ISREndDoc.Seek sets docLength to the raw delta at the sync point
  *    (no -1, isr.h:131) — an off-by-one the reference exhibits for any
  *    seek landing directly on a stripe's first EndDoc (in practice: the
  *    first document of a chunk), which shifts that doc's docStart to 0
  *    and its nearTop window by one. Replicated.
  *  - ISRAnd.Seek returns "dead" without clearing its current post when
  *    the EndDoc ISR exhausts (isr.h:288-289) — callers must gate on the
  *    return value, as ISROr does.
  */
object Isr {
  val Max: Long = GraftConfig.LocationMax

  /** first-posting-per-stripe table (the syncTable analog, built the way
    * index.h:64-70 populates it: first location whose `>> 20` equals the
    * stripe).
    */
  def stripeFirsts(locs: Array[Long]): java.util.HashMap[Long, Int] = {
    val m = new java.util.HashMap[Long, Int]
    var i = 0
    while (i < locs.length) {
      val s = locs(i) >> GraftConfig.StripeShift
      if (!m.containsKey(s)) m.put(s, i)
      i += 1
    }
    m
  }
}

sealed trait IsrNode {
  /** currentPost != null in the reference. */
  def hasPost: Boolean
  /** getStartLocation() — sentinel/stale semantics per class. */
  def startLocation: Long
  def next(): Boolean
  def seek(target: Long): Boolean
}

/** ISRWord (isr.h:49-114). `locs` == null models a term absent from the
  * chunk (ISRWord(nullptr): currentPost null from construction).
  *
  * Seek is implemented as a binary search that lands on exactly the
  * posting the reference's jump-then-linear-scan would: with a sync
  * stripe entry, the scan starts at the stripe's first posting and stops
  * at the first location >= target (= lower bound from the jump index);
  * without one, it scans forward from the current posting (= lower bound
  * from the current index, staying put when already past target). Same
  * observable state, O(log n) instead of O(n) per seek.
  */
final class IsrWord(locs: Array[Long]) extends IsrNode {
  private val stripes = if (locs == null) null else Isr.stripeFirsts(locs)
  private var idx: Int = -1              // -1 = initial Post(0,0)
  private var alive: Boolean = locs != null

  def hasPost: Boolean = alive
  def startLocation: Long =
    if (!alive) Isr.Max else if (idx < 0) 0L else locs(idx)

  def next(): Boolean = {
    if (!alive) return false
    if (idx + 1 < locs.length) { idx += 1; true }
    else { alive = false; false }
  }

  /** first index in [from, n) with locs(i) >= target, or n. */
  private def lowerBound(target: Long, from: Int): Int = {
    var lo = from
    var hi = locs.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (locs(mid) < target) lo = mid + 1 else hi = mid
    }
    lo
  }

  def seek(target: Long): Boolean = {
    if (!alive) return false
    val jump = stripes.get(target >> GraftConfig.StripeShift)
    val from =
      if (jump != null) jump.intValue() // sync jump (possibly backward)
      else math.max(idx, 0)
    if (jump == null && idx >= 0 && locs(idx) >= target) return true // stays put
    val j = lowerBound(target, from)
    if (j >= locs.length) { idx = locs.length - 1; alive = false; false }
    else { idx = j; true }
  }
}

/** ISREndDoc (isr.h:116-158). Walks the ##EndDoc location list carrying
  * (docLength, urlIndex) side data.
  */
final class IsrEndDoc(endLocs: Array[Long], urlIdxs: Array[Int]) extends IsrNode {
  private val stripes = Isr.stripeFirsts(endLocs)
  private var idx: Int = -1
  private var alive: Boolean = true
  var docLength: Long = 0L
  var urlIndex: Int = 0

  def hasPost: Boolean = alive
  def startLocation: Long =
    if (!alive) Isr.Max else if (idx < 0) 0L else endLocs(idx)

  def next(): Boolean = {
    if (!alive) return false
    if (idx + 1 < endLocs.length) {
      idx += 1
      val prev = if (idx == 0) 0L else endLocs(idx - 1)
      docLength = endLocs(idx) - prev - 1 // delta - 1 (isr.h:151)
      urlIndex = urlIdxs(idx)
      true
    } else { alive = false; false }
  }

  /** first index in [from, n) with endLocs(i) >= target, or n. */
  private def lowerBound(target: Long, from: Int): Int = {
    var lo = from
    var hi = endLocs.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (endLocs(mid) < target) lo = mid + 1 else hi = mid
    }
    lo
  }

  def seek(target: Long): Boolean = {
    if (!alive) return false
    val jump = stripes.get(target >> GraftConfig.StripeShift)
    if (jump != null) {
      val ji = jump.intValue()
      if (endLocs(ji) >= target) {
        // jump lands at-or-past target directly: docLength keeps the RAW
        // delta of the sync posting, NO -1 (the isr.h:131 quirk)
        idx = ji
        docLength = endLocs(ji) - (if (ji == 0) 0L else endLocs(ji - 1))
        urlIndex = urlIdxs(ji)
        return true
      }
      // jump lands before target; subsequent Next()s recompute normally
      val j = lowerBound(target, ji)
      if (j >= endLocs.length) { idx = endLocs.length - 1; alive = false; return false }
      idx = j
      docLength = endLocs(j) - (if (j == 0) 0L else endLocs(j - 1)) - 1
      urlIndex = urlIdxs(j)
      true
    } else {
      if (idx >= 0 && endLocs(idx) >= target) return true // stays put, state kept
      val j = lowerBound(target, math.max(idx, 0))
      if (j >= endLocs.length) { idx = endLocs.length - 1; alive = false; return false }
      idx = j
      docLength = endLocs(j) - (if (j == 0) 0L else endLocs(j - 1)) - 1
      urlIndex = urlIdxs(j)
      true
    }
  }
}

/** ISROr (isr.h:160-248). */
final class IsrOr(terms: Array[IsrNode], val docEnd: IsrEndDoc) extends IsrNode {
  private var alive = true
  private var nearestStart: Long = 0L

  def hasPost: Boolean = alive
  def startLocation: Long = nearestStart // field getter, stale-capable (isr.h:234-237)

  def seek(target: Long): Boolean = {
    var currentNearest = Isr.Max
    var i = 0
    while (i < terms.length) {
      if (terms(i).seek(target) && terms(i).hasPost &&
          terms(i).startLocation < currentNearest) {
        currentNearest = terms(i).startLocation
        nearestStart = terms(i).startLocation
      }
      i += 1
    }
    if (currentNearest == Isr.Max) { alive = false; false }
    else { docEnd.seek(nearestStart); alive = true; true }
  }

  def next(): Boolean = seek(nearestStart + 1) // engine uses nextDocument only

  def nextDocument(): Boolean =
    if (docEnd.hasPost) seek(docEnd.startLocation + 1)
    else { alive = false; false }
}

/** ISRAnd (isr.h:250-354). */
final class IsrAnd(terms: Array[IsrNode], val docEnd: IsrEndDoc) extends IsrNode {
  private var alive = true
  private var nearestStart: Long = 0L

  def hasPost: Boolean = alive
  def startLocation: Long = nearestStart

  def seek(target: Long): Boolean = {
    var currentFarthest = 0L
    var farthest = 0
    var i = 0
    while (i < terms.length) {
      if (!terms(i).seek(target)) { alive = false; return false }
      if (terms(i).startLocation > currentFarthest) {
        currentFarthest = terms(i).startLocation; farthest = i
      }
      i += 1
    }
    while (true) {
      var moveToNextDoc = false
      // stale-post quirk: alive is NOT cleared here (isr.h:288-289)
      if (!docEnd.seek(currentFarthest)) return false
      val seekTarget = docEnd.startLocation - docEnd.docLength
      i = 0
      while (i < terms.length) {
        if (i != farthest) {
          if (!terms(i).seek(seekTarget)) { alive = false; return false }
          if (terms(i).startLocation > docEnd.startLocation) {
            currentFarthest = terms(i).startLocation
            farthest = i
            moveToNextDoc = true
            // C++ `continue`s the inner for-loop here; later terms are
            // still seeked against the OLD doc and the LAST exceeding
            // term wins currentFarthest (no max), replicated as-is
          }
        }
        i += 1
      }
      if (!moveToNextDoc) {
        var currentNearest = currentFarthest
        i = 0
        while (i < terms.length) {
          if (terms(i).startLocation <= currentNearest) {
            currentNearest = terms(i).startLocation
            nearestStart = terms(i).startLocation
          }
          i += 1
        }
        alive = true
        return true
      }
    }
    false // unreachable
  }

  def next(): Boolean = seek(nearestStart + 1)

  def nextDocument(): Boolean =
    if (docEnd.hasPost) seek(docEnd.startLocation + 1)
    else { alive = false; false }
}

/** ISRPhrase (isr.h:356-450). Terms in phrase order. */
final class IsrPhrase(terms: Array[IsrNode], val docEnd: IsrEndDoc) extends IsrNode {
  private var alive = true
  private var nearestStart: Long = 0L

  def hasPost: Boolean = alive
  def startLocation: Long = nearestStart

  def seek(target: Long): Boolean = {
    var currentFarthest = 0L
    var farthest = 0
    var i = 0
    while (i < terms.length) {
      if (!terms(i).seek(target)) { alive = false; return false }
      if (terms(i).startLocation > currentFarthest) {
        currentFarthest = terms(i).startLocation; farthest = i
      }
      i += 1
    }
    while (true) {
      var moveToNextDoc = false
      i = 0
      while (i < terms.length && !moveToNextDoc) {
        if (i != farthest) {
          val rawDesired = currentFarthest + i - farthest
          // size_t underflow in the C++ becomes a huge location -> the
          // seek exhausts the list; model with Max+1 (isr.h:401)
          val desired = if (rawDesired < 1) Isr.Max + 1 else rawDesired
          if (!terms(i).seek(desired)) { alive = false; return false }
          if (terms(i).startLocation > desired) {
            currentFarthest = terms(i).startLocation
            farthest = i
            moveToNextDoc = true // C++ breaks the inner loop here
          }
        }
        i += 1
      }
      if (!moveToNextDoc) {
        nearestStart = terms(0).startLocation
        val nearestEnd = terms(terms.length - 1).startLocation
        docEnd.seek(nearestEnd)
        alive = true
        return true
      }
    }
    false // unreachable
  }

  def next(): Boolean = seek(nearestStart + 1)

  def nextDocument(): Boolean =
    if (docEnd.hasPost) seek(docEnd.startLocation + 1)
    else { alive = false; false }
}
