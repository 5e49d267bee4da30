package graft.engine

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

import org.apache.spark.sql.SparkSession
import graft.index.IndexBuilder
import graft.rank.Bm25

/** Serving-layer query cache + index hot-reload — what the reference's
  * long-lived index servers get for free from an IMMUTABLE mmap'd index
  * (index/indexServer.cpp keeps one HashBlob open forever), re-expressed
  * for a MUTABLE one: repeat queries are memoized per (terms, k, mode,
  * wand), and staleness is detected with an O(maintenance-log) version
  * probe — the pair (lineage row count, pending-tombstone row count).
  * Every build / append / merge / compact APPENDS lineage rows, and
  * markDeleted changes the tombstone count; compact clears tombstones
  * but always appends lineage, so no maintenance sequence can restore an
  * earlier token (no ABA). When the token moves, the wrapped
  * [[Bm25Engine]] itself is REBUILT — its cached posting/doc scans are
  * stale after a compact rewrote partitions — and the result cache
  * drops. The version probe is two footer-light counts per query; serve
  * paths that cannot afford them can snapshot the token once per
  * maintenance cycle instead (the `checkVersion = false` fast path).
  *
  * Thread-safe: the pthread-per-request model (indexServer.cpp:178-198)
  * — concurrent queries share one engine; the swap is a volatile
  * replace; a query racing a swap at worst computes against the engine
  * generation it started with (the same guarantee a reloading file
  * server gives).
  */
class Bm25Serving(spark: SparkSession, indexDir: String,
                  maxEntries: Int = 1024) {
  require(maxEntries > 0, s"maxEntries must be positive, got $maxEntries")

  private final case class Key(terms: Seq[String], k: Int,
                               mode: Bm25Engine.Mode, wand: Boolean)
  private final class Gen(val token: (Long, Long)) {
    val engine = new Bm25Engine(spark, indexDir)
    val cache = new ConcurrentHashMap[Key, Seq[Bm25.Hit]]()
  }

  private val hitCount = new LongAdder
  private val missCount = new LongAdder
  private val reloadCount = new LongAdder
  @volatile private var gen: Gen = new Gen(version())

  import Bm25Serving.isNewer

  /** (lineage rows, pending tombstone rows) — the invalidation token. */
  private def version(): (Long, Long) = {
    val lin =
      if (IndexBuilder.pathExists(spark, IndexBuilder.lineageDir(indexDir)))
        spark.read.parquet(IndexBuilder.lineageDir(indexDir)).count()
      else 0L
    val tomb = graft.index.IndexStore.readTombstones(spark, indexDir).count()
    (lin, tomb)
  }

  /** Cached lookup; `checkVersion = false` skips the staleness probe for
    * callers that re-validate out of band (serve-path fast mode).
    */
  def searchTerms(terms: Seq[String], k: Int,
                  mode: Bm25Engine.Mode = Bm25Engine.Or,
                  useWand: Boolean = true,
                  checkVersion: Boolean = true): Seq[Bm25.Hit] = {
    var g = gen
    if (checkVersion) {
      val v = version()
      if (v != g.token) {
        synchronized {
          // re-check under the lock, and swap only FORWARD: a thread
          // that probed an older version must not replace a generation
          // another thread already advanced past it (that would drop
          // the newer generation's warm cache and force a re-reload).
          if (isNewer(v, gen.token)) {
            gen = new Gen(v)
            reloadCount.increment()
          }
        }
        g = gen
      }
    }
    val key = Key(terms.distinct.sorted, k, mode, useWand)
    val cached = g.cache.get(key)
    if (cached != null) { hitCount.increment(); return cached }
    missCount.increment()
    val res = g.engine.searchTerms(terms, k, mode, useWand)
    if (g.cache.size >= maxEntries) g.cache.clear() // bounded, coarse
    g.cache.put(key, res)
    res
  }

  /** (cache hits, misses, engine reloads) — observability counters. */
  def stats: (Long, Long, Long) =
    (hitCount.sum, missCount.sum, reloadCount.sum)

  /** The current engine generation (tests + advanced callers). */
  def engine: Bm25Engine = gen.engine
}

object Bm25Serving {
  /** Token ordering: lineage rows are append-only, and at a fixed
    * lineage count tombstones only accumulate (markDeleted appends;
    * compact clears them but appends lineage) — so (lin, tomb) is
    * lexicographically monotonic across any maintenance sequence, and
    * "newer" is strict lexicographic greater-than. The swap path only
    * moves FORWARD under this order (a thread holding a stale probe
    * must never replace a generation that already advanced past it).
    */
  private[graft] def isNewer(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 > b._2)
}
