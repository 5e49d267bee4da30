package graft.rank

import graft.codec.{PostingBlock, PostingCodec}

/** BM25 scoring + per-chunk top-k kernels (the north star's benchmark
  * path; SURVEY.md §2.9 maps the reference stats onto BM25: tf ≙
  * numOccurance, df ≙ numberOfDocuments, dl ≙ docLength, avgdl ≙
  * NumberOfPosts/numDocs). Statistics are GLOBAL (summed over chunks and
  * broadcast) so scores are comparable across chunks and the cross-chunk
  * merge is a plain top-k — unlike the RefScore path, which reproduces the
  * reference's per-chunk isolation.
  *
  * Three evaluation strategies over the same compressed chunks:
  *  - [[scoreExhaustive]]: accumulate over every posting — the
  *    correctness baseline the WAND path is asserted against.
  *  - [[scoreWand]]: document-at-a-time block-max WAND: term upper bounds
  *    select a pivot, per-block maxTf (the syncTable-analog skip metadata)
  *    refines the bound and skips whole blocks that cannot beat the
  *    running threshold (Ding & Suel, "Faster top-k document retrieval
  *    using block-max indexes", SIGIR'11).
  *  - [[scoreConjunctive]]: adaptive leapfrog intersection anchored on
  *    the rarest list (the ISRAnd strategy, isr.h:266-328, on docId
  *    space) with full scoring of matches.
  */
object Bm25 {
  val K1 = 1.2
  val B = 0.75

  /** Lucene-style non-negative idf over global stats. */
  def idf(n: Long, df: Long): Double =
    math.log((n - df + 0.5) / (df + 0.5) + 1.0)

  def tfPart(tf: Double, dl: Double, avgdl: Double): Double =
    tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))

  /** Max possible tfPart for a given tf (dl -> 0); monotone in tf. */
  def tfPartUpperBound(tf: Double): Double =
    tf * (K1 + 1.0) / (tf + K1 * (1.0 - B))

  /** One query term's posting list within a chunk; idf precomputed from
    * global df, maxTf = max over the list's blocks.
    */
  case class TermList(term: String, idf: Double, maxTf: Int,
                      df: Long, blocks: Array[PostingBlock], blob: Array[Byte])

  case class Hit(docId: Long, score: Double)

  /** total order: better = higher score, then smaller docId. */
  val better: Ordering[Hit] = (a: Hit, b: Hit) => {
    val c = java.lang.Double.compare(a.score, b.score)
    if (c != 0) c else java.lang.Long.compare(b.docId, a.docId)
  }

  /** Fixed-size top-k: min-heap whose head is the worst kept hit. */
  final class TopK(k: Int) {
    private val heap = scala.collection.mutable.PriorityQueue.empty[Hit](better.reverse)
    def size: Int = heap.size
    def full: Boolean = heap.size >= k
    /** current k-th best score (only meaningful when full). */
    def threshold: Double = if (full) heap.head.score else Double.NegativeInfinity
    def offer(h: Hit): Unit =
      if (heap.size < k) heap.enqueue(h)
      else if (better.compare(h, heap.head) > 0) { heap.dequeue(); heap.enqueue(h) }
    /** drains; best first. */
    def result(): Array[Hit] = heap.dequeueAll.reverse.toArray
  }

  type DocLen = Long => Double

  def scoreExhaustive(terms: Seq[TermList], docLen: DocLen, avgdl: Double,
                      k: Int, conjunctive: Boolean = false): Array[Hit] = {
    val acc = new java.util.HashMap[Long, Array[Double]]() // docId -> [score, nTerms]
    terms.foreach { t =>
      PostingCodec.decode(t.df, t.blob).foreach { case (docId, positions) =>
        val cell = acc.computeIfAbsent(docId, _ => new Array[Double](2))
        cell(0) += t.idf * tfPart(positions.length.toDouble, docLen(docId), avgdl)
        cell(1) += 1
      }
    }
    val top = new TopK(k)
    val need = terms.size.toDouble
    val it = acc.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (!conjunctive || e.getValue()(1) == need)
        top.offer(Hit(e.getKey, e.getValue()(0)))
    }
    top.result()
  }

  /** Block-max WAND top-k (disjunctive). */
  def scoreWand(terms: Seq[TermList], docLen: DocLen, avgdl: Double, k: Int): Array[Hit] = {
    class Cur(val t: TermList) {
      val c = new PostingCodec.Cursor(t.df, t.blocks, t.blob)
      c.next()
      val ub: Double = t.idf * tfPartUpperBound(t.maxTf.toDouble)
      def docId: Long = c.docId
      def blockUb: Double = t.idf * tfPartUpperBound(c.currentBlockMaxTf.toDouble)
    }
    var live: Array[Cur] = terms.map(new Cur(_)).filter(_.docId != Long.MaxValue).toArray
    val top = new TopK(k)

    while (live.nonEmpty) {
      val sorted = live.sortBy(_.docId)
      // pivot: smallest prefix whose summed UBs could beat the threshold
      val theta = top.threshold
      var pivotIdx = -1
      if (!top.full) pivotIdx = 0
      else {
        var acc = 0.0
        var i = 0
        while (i < sorted.length && pivotIdx < 0) {
          acc += sorted(i).ub
          if (acc >= theta) pivotIdx = i
          i += 1
        }
      }
      if (pivotIdx < 0) return top.result() // nothing can beat theta
      val pivotDoc = sorted(pivotIdx).docId

      if (sorted(0).docId == pivotDoc) {
        // extend the prefix over every cursor parked on pivotDoc so the
        // block-max bound and skip target see all of them
        var lastAt = pivotIdx
        while (lastAt + 1 < sorted.length && sorted(lastAt + 1).docId == pivotDoc)
          lastAt += 1
        var blockUb = 0.0
        var i = 0
        while (i <= lastAt) { blockUb += sorted(i).blockUb; i += 1 }
        if (top.full && blockUb < theta) {
          // no doc in these blocks can beat theta: jump past the nearest
          // block end among the prefix, but never past the first cursor
          // outside it (docs there gain additional term mass)
          var nextD = Long.MaxValue
          i = 0
          while (i <= lastAt) {
            val last = sorted(i).c.currentBlockLastDocId
            if (last < nextD) nextD = last
            i += 1
          }
          var target = math.max(nextD, pivotDoc) + 1
          if (lastAt + 1 < sorted.length)
            target = math.min(target, sorted(lastAt + 1).docId)
          i = 0
          while (i <= lastAt) { sorted(i).c.seek(target); i += 1 }
        } else {
          // full evaluation of pivotDoc (any cursor may sit on it)
          var score = 0.0
          i = 0
          while (i < sorted.length && sorted(i).docId == pivotDoc) {
            score += sorted(i).t.idf *
              tfPart(sorted(i).c.tf.toDouble, docLen(pivotDoc), avgdl)
            i += 1
          }
          top.offer(Hit(pivotDoc, score))
          i = 0
          while (i < sorted.length && sorted(i).docId == pivotDoc) {
            sorted(i).c.seek(pivotDoc + 1); i += 1
          }
        }
      } else {
        // advance the highest-impact cursor that is strictly before the
        // pivot doc (picking one already AT pivotDoc would not progress)
        var pick = 0
        var i = 1
        while (i < pivotIdx && sorted(i).docId < pivotDoc) {
          if (sorted(i).ub > sorted(pick).ub) pick = i
          i += 1
        }
        sorted(pick).c.seek(pivotDoc)
      }
      live = live.filter(_.docId != Long.MaxValue)
    }
    top.result()
  }

  // ---------------------------------------------------------------------
  // BM25F — field-weighted scoring over the SAME compressed index.
  // The reference keeps title terms '#'-decorated in the one dictionary
  // (ranker/ranker.h:742-745), so a document's two fields are two posting
  // lists of the same chunk: `t` (body) and `"#" + t` (title). BM25F
  // (Robertson, Zaragoza & Taylor, CIKM'04, "simple BM25F" shape)
  // normalizes tf per field, sums the weighted normalized tfs, and
  // saturates ONCE:
  //   tf~_f = tf_f / (1 + b * (dl_f / avgdl_f - 1))
  //   wtf   = w_body * tf~_body + w_title * tf~_title
  //   score = sum_t idf_union(t) * wtf / (k1 + wtf)
  // idf_union uses the term's document frequency in EITHER field (the
  // per-document union), so a title-only match still counts as presence.
  // ---------------------------------------------------------------------

  /** One query term's per-chunk field lists: (df, blob) per present field. */
  case class FieldLists(term: String, idf: Double,
                        body: Option[(Long, Array[Byte])],
                        title: Option[(Long, Array[Byte])])

  /** |body ∪ title| docIds of one term within one chunk. Decoded docId
    * streams are ascending, so this is a linear two-pointer merge count.
    */
  def unionDf(body: Option[(Long, Array[Byte])],
              title: Option[(Long, Array[Byte])]): Long = {
    val a = body.map { case (df, blob) => PostingCodec.decode(df, blob) }
      .getOrElse(Array.empty[(Long, Array[Long])])
    val b = title.map { case (df, blob) => PostingCodec.decode(df, blob) }
      .getOrElse(Array.empty[(Long, Array[Long])])
    var i = 0; var j = 0; var n = 0L
    while (i < a.length && j < b.length) {
      val c = java.lang.Long.compare(a(i)._1, b(j)._1)
      if (c < 0) i += 1 else if (c > 0) j += 1 else { i += 1; j += 1 }
      n += 1
    }
    n + (a.length - i) + (b.length - j)
  }

  /** BM25F top-k within one chunk. `dlBody`/`dlTitle` are the per-field
    * document lengths (body: kept tokens minus the raw title count,
    * clamped at 0; title: the reference's stored numTitleWords — its own
    * title-rank denominator, ranker.h:668). A field whose corpus-average
    * length is 0 contributes nothing (no such field in the corpus).
    */
  def scoreBm25F(terms: Seq[FieldLists], dlBody: DocLen, dlTitle: DocLen,
                 avgdlBody: Double, avgdlTitle: Double,
                 wBody: Double, wTitle: Double, k: Int): Array[Hit] = {
    val acc = new java.util.HashMap[Long, Array[Double]]()
    terms.foreach { t =>
      val wtf = new java.util.HashMap[Long, java.lang.Double]()
      def accumulate(field: Option[(Long, Array[Byte])], w: Double,
                     dl: DocLen, avgdl: Double): Unit =
        if (avgdl > 0) field.foreach { case (df, blob) =>
          PostingCodec.decode(df, blob).foreach { case (docId, positions) =>
            val norm = 1.0 + B * (dl(docId) / avgdl - 1.0)
            val add = w * positions.length.toDouble / norm
            wtf.merge(docId, add, (x, y) => x + y)
          }
        }
      accumulate(t.body, wBody, dlBody, avgdlBody)
      accumulate(t.title, wTitle, dlTitle, avgdlTitle)
      wtf.forEach { (docId, w) =>
        acc.computeIfAbsent(docId, _ => new Array[Double](1))(0) +=
          t.idf * w / (K1 + w)
      }
    }
    val top = new TopK(k)
    val it = acc.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      top.offer(Hit(e.getKey, e.getValue()(0)))
    }
    top.result()
  }

  /** |body ∪ title| via block-skipping leapfrog: df_b + df_t − |∩|,
    * with the intersection counted by alternating cursor seeks —
    * O(min df · log) probes instead of [[unionDf]]'s full decode. Same
    * integer result (set cardinality); the champion fielded ranker's
    * idf source.
    */
  def unionDfSkip(body: Option[(Long, Array[PostingBlock], Array[Byte])],
                  title: Option[(Long, Array[PostingBlock], Array[Byte])]): Long =
    (body, title) match {
      case (None, None) => 0L
      case (Some((df, _, _)), None) => df
      case (None, Some((df, _, _))) => df
      case (Some((dfb, bb, blb)), Some((dft, tb, tlb))) =>
        val a = new PostingCodec.Cursor(dfb, bb, blb)
        val b = new PostingCodec.Cursor(dft, tb, tlb)
        var inter = 0L
        var liveA = a.next()
        var liveB = b.next()
        while (liveA && liveB) {
          if (a.docId == b.docId) {
            inter += 1L; liveA = a.next(); liveB = b.next()
          } else if (a.docId < b.docId) liveA = a.seek(b.docId)
          else liveB = b.seek(a.docId)
        }
        dfb + dft - inter
    }

  /** One query term's per-field lists WITH skip metadata — the champion
    * stage-2 fielded kernel seeks candidates instead of decoding whole
    * lists, so it needs each field's blocks alongside the blob.
    */
  case class FieldCursorLists(term: String, idf: Double,
      body: Option[(Long, Array[PostingBlock], Array[Byte])],
      title: Option[(Long, Array[PostingBlock], Array[Byte])])

  /** BM25F of an explicit candidate set (champion stage 2 for the
    * fielded ranker): per term, one block-skipping cursor PER FIELD
    * walks the ascending candidate list — O(|cand| log) probes per
    * field, never a full decode of a stopword-sized list — and the
    * weighted field tfs fold into the shared soft-OR saturation in the
    * same body-then-title, term-by-term order as [[scoreBm25F]], so the
    * result is float-identical to the exhaustive kernel restricted to
    * the candidates.
    */
  def scoreBm25FCandidates(terms: Seq[FieldCursorLists],
                           dlBody: DocLen, dlTitle: DocLen,
                           avgdlBody: Double, avgdlTitle: Double,
                           wBody: Double, wTitle: Double,
                           candSorted: Array[Long], k: Int): Array[Hit] = {
    val wtf = new Array[Double](candSorted.length)
    val scores = new Array[Double](candSorted.length)
    terms.foreach { t =>
      java.util.Arrays.fill(wtf, 0.0)
      def walk(field: Option[(Long, Array[PostingBlock], Array[Byte])],
               w: Double, dl: DocLen, avgdl: Double): Unit =
        if (avgdl > 0) field.foreach { case (df, blocks, blob) =>
          val c = new PostingCodec.Cursor(df, blocks, blob)
          if (c.next()) {
            var i = 0
            var live = true
            while (i < candSorted.length && live) {
              if (!c.seek(candSorted(i))) live = false
              else if (c.docId == candSorted(i)) {
                val norm = 1.0 + B * (dl(candSorted(i)) / avgdl - 1.0)
                wtf(i) += w * c.tf.toDouble / norm
              }
              i += 1
            }
          }
        }
      walk(t.body, wBody, dlBody, avgdlBody)
      walk(t.title, wTitle, dlTitle, avgdlTitle)
      var i = 0
      while (i < candSorted.length) {
        if (wtf(i) > 0.0) scores(i) += t.idf * wtf(i) / (K1 + wtf(i))
        i += 1
      }
    }
    val top = new TopK(k)
    var i = 0
    while (i < candSorted.length) {
      if (scores(i) > 0.0) top.offer(Hit(candSorted(i), scores(i)))
      i += 1
    }
    top.result()
  }

  /** One query term for the Dirichlet query-likelihood ranker: `pc` is
    * the collection model p(t|C) = cf_t / |C| (collection frequency over
    * total kept tokens).
    */
  case class QlTerm(term: String, pc: Double, df: Long, blob: Array[Byte])

  /** Dirichlet-smoothed query likelihood (Zhai & Lafferty, SIGIR'01) —
    * the classic LM alternative to BM25 over the same postings:
    *   score(d) = Σ_t ln( (tf_{t,d} + μ·p(t|C)) / (dl_d + μ) )
    * evaluated over the FULL query (absent-in-doc terms contribute the
    * smoothed background mass), candidates = docs matching >= 1 term (the
    * standard inverted-index evaluation set). Terms with cf = 0 must be
    * dropped by the CALLER (p(t|C) = 0 zeroes the whole likelihood).
    */
  def scoreQl(terms: Seq[QlTerm], docLen: DocLen, mu: Double, k: Int): Array[Hit] = {
    val tfs = terms.map { t =>
      val m = new java.util.HashMap[Long, Int]()
      PostingCodec.decode(t.df, t.blob).foreach { case (id, ps) => m.put(id, ps.length) }
      m
    }
    val cand = new java.util.HashSet[Long]()
    tfs.foreach(m => cand.addAll(m.keySet))
    val top = new TopK(k)
    cand.forEach { id =>
      val dl = docLen(id)
      var s = 0.0
      var i = 0
      while (i < terms.size) {
        val tf = tfs(i).getOrDefault(id, 0)
        s += math.log((tf + mu * terms(i).pc) / (dl + mu))
        i += 1
      }
      top.offer(Hit(id, s))
    }
    top.result()
  }

  /** Per-doc PHRASE term frequency within one chunk: number of positions
    * p with term_i at p + i for every i (consecutive run). Title tokens
    * are '#'-decorated, so a plain-term phrase can only match inside the
    * body, where kept positions are consecutive. Lists in phrase order.
    */
  def phraseTfs(lists: Seq[(Long, Array[Byte])]): java.util.LinkedHashMap[Long, Int] = {
    val out = new java.util.LinkedHashMap[Long, Int]()
    if (lists.isEmpty) return out
    val decoded = lists.map { case (df, blob) =>
      val m = new java.util.HashMap[Long, Array[Long]]()
      PostingCodec.decode(df, blob).foreach { case (id, ps) => m.put(id, ps) }
      m
    }
    val sets = decoded.drop(1).map { m =>
      val s = new java.util.HashMap[Long, java.util.HashSet[Long]]()
      m.forEach { (id, ps) =>
        val hs = new java.util.HashSet[Long](ps.length * 2)
        ps.foreach(p => hs.add(p))
        s.put(id, hs)
      }
      s
    }
    decoded.head.forEach { (id, ps) =>
      if (sets.forall(_.containsKey(id))) {
        var tf = 0
        ps.foreach { p =>
          var i = 0
          var ok = true
          while (ok && i < sets.size) {
            if (!sets(i).get(id).contains(p + i + 1L)) ok = false
            i += 1
          }
          if (ok) tf += 1
        }
        if (tf > 0) out.put(id, tf)
      }
    }
    out
  }

  /** Proximity-weighted BM25 (Rasolofo & Savoy, ECIR'03 shape): the
    * exhaustive BM25 score plus, per unordered query-term pair present in
    * a doc, min(idf_i, idf_j) * a / (a + k1) where a accumulates 1/dist²
    * over occurrence pairs within `window` positions. The accumulator is
    * frozen to INTEGER micro-units (round(1e6/d²) per pair, summed as
    * Long) so a DuckDB oracle sums the identical integers — the repo's
    * standard trick for cross-engine float exactness. Positions carry the
    * per-doc title offset, which cancels in every distance. Occurrence
    * pairs walk two sorted position arrays with a sliding window —
    * O(occ_i + occ_j + matches), never the full cross product.
    */
  def scoreProximity(terms: Seq[TermList], docLen: DocLen, avgdl: Double,
                     k: Int, window: Int = 5): Array[Hit] =
    proximityFromDecoded(terms.map { t =>
      val m = new java.util.LinkedHashMap[Long, Array[Long]]()
      PostingCodec.decode(t.df, t.blob).foreach { case (id, ps) => m.put(id, ps) }
      (t, m)
    }, docLen, avgdl, k, window)

  /** Proximity of an explicit candidate set (champion stage 2 for the
    * proximity ranker): per term, one block-skipping cursor collects the
    * CANDIDATES' position arrays — O(|cand| log) probes per list — then
    * the identical pair-walk runs on the filtered maps. Per-doc scoring
    * is independent across docs and the pair micro-accumulator is exact
    * integer arithmetic, so the result equals [[scoreProximity]]
    * restricted to the candidates.
    */
  def scoreProximityCandidates(terms: Seq[TermList], docLen: DocLen,
                               avgdl: Double, candSorted: Array[Long],
                               k: Int, window: Int = 5): Array[Hit] =
    proximityFromDecoded(terms.map { t =>
      val m = new java.util.LinkedHashMap[Long, Array[Long]]()
      val c = new PostingCodec.Cursor(t.df, t.blocks, t.blob)
      if (c.next()) {
        var i = 0
        var live = true
        while (i < candSorted.length && live) {
          if (!c.seek(candSorted(i))) live = false
          else if (c.docId == candSorted(i)) m.put(c.docId, c.positions)
          i += 1
        }
      }
      (t, m)
    }, docLen, avgdl, k, window)

  private def proximityFromDecoded(
      decoded: Seq[(TermList, java.util.LinkedHashMap[Long, Array[Long]])],
      docLen: DocLen, avgdl: Double, k: Int, window: Int): Array[Hit] = {
    val acc = new java.util.HashMap[Long, Array[Double]]()
    decoded.foreach { case (t, m) =>
      m.forEach { (id, ps) =>
        acc.computeIfAbsent(id, _ => new Array[Double](1))(0) +=
          t.idf * tfPart(ps.length.toDouble, docLen(id), avgdl)
      }
    }
    val micro = Array.tabulate(window + 1)(d =>
      if (d == 0) 0L else math.round(1e6 / (d.toDouble * d)))
    var i = 0
    while (i < decoded.size) {
      var j = i + 1
      while (j < decoded.size) {
        val (ti, mi) = decoded(i)
        val (tj, mj) = decoded(j)
        val idfMin = math.min(ti.idf, tj.idf)
        val (small, other) = if (mi.size <= mj.size) (mi, mj) else (mj, mi)
        small.forEach { (id, pa) =>
          val pb = other.get(id)
          if (pb != null) {
            var accM = 0L
            var ai = 0
            var lo = 0
            while (ai < pa.length) {
              while (lo < pb.length && pb(lo) < pa(ai) - window) lo += 1
              var bj = lo
              while (bj < pb.length && pb(bj) <= pa(ai) + window) {
                val d = math.abs(pa(ai) - pb(bj)).toInt
                if (d >= 1) accM += micro(d)
                bj += 1
              }
              ai += 1
            }
            if (accM > 0L) {
              val a = accM.toDouble / 1e6
              acc.get(id)(0) += idfMin * a / (a + K1)
            }
          }
        }
        j += 1
      }
      i += 1
    }
    val top = new TopK(k)
    val it = acc.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      top.offer(Hit(e.getKey, e.getValue()(0)))
    }
    top.result()
  }

  /** Full BM25 of an explicit candidate set (champion-list stage 2,
    * IIR §7.1.3 static pruning): for each term, one cursor walks the
    * ascending candidate list with block-skip seeks — O(|cand| log)
    * probes, never a full decode of the (potentially huge) lists.
    * `candSorted` must be ascending docIds within this chunk.
    */
  def scoreCandidates(terms: Seq[TermList], docLen: DocLen, avgdl: Double,
                      candSorted: Array[Long], k: Int): Array[Hit] = {
    val scores = new Array[Double](candSorted.length)
    terms.foreach { t =>
      val c = new PostingCodec.Cursor(t.df, t.blocks, t.blob)
      if (c.next()) {
        var i = 0
        var live = true
        while (i < candSorted.length && live) {
          if (!c.seek(candSorted(i))) live = false
          else if (c.docId == candSorted(i))
            scores(i) += t.idf * tfPart(c.tf.toDouble, docLen(candSorted(i)), avgdl)
          i += 1
        }
      }
    }
    val top = new TopK(k)
    var i = 0
    while (i < candSorted.length) {
      if (scores(i) > 0.0) top.offer(Hit(candSorted(i), scores(i)))
      i += 1
    }
    top.result()
  }

  /** Conjunctive leapfrog with full scoring of intersecting docs. */
  def scoreConjunctive(terms: Seq[TermList], docLen: DocLen, avgdl: Double, k: Int): Array[Hit] = {
    if (terms.isEmpty) return Array.empty
    val curs = terms.sortBy(_.df).map { t =>
      (t, new PostingCodec.Cursor(t.df, t.blocks, t.blob))
    }.toArray
    if (curs.exists(!_._2.next())) return Array.empty
    val top = new TopK(k)
    var target = curs(0)._2.docId
    var done = false
    while (!done) {
      var m = target
      var allMatch = true
      var i = 0
      while (i < curs.length && !done) {
        if (!curs(i)._2.seek(m)) done = true
        else if (curs(i)._2.docId > m) { m = curs(i)._2.docId; allMatch = false }
        i += 1
      }
      if (!done) {
        if (allMatch) {
          var score = 0.0
          i = 0
          while (i < curs.length) {
            score += curs(i)._1.idf * tfPart(curs(i)._2.tf.toDouble, docLen(m), avgdl)
            i += 1
          }
          top.offer(Hit(m, score))
          if (!curs(0)._2.seek(m + 1)) done = true
          else target = curs(0)._2.docId
        } else target = m
      }
    }
    top.result()
  }
}
