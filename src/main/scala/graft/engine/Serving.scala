package graft.engine

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.sql.SparkSession
import graft.config.GraftConfig
import graft.index.IndexBuilder
import graft.rank.{Bm25, DocScore}

/** The shared index-version token for serving caches: the pair
  * (lineage file count, tombstone dir bytes+files) from a DRIVER-SIDE
  * FileSystem listing — ZERO Spark jobs per probe. The reference's
  * long-lived servers answer with zero freshness cost because their
  * index is an immutable mmap (index/indexServer.cpp:70-91); a mutable
  * index gets the same property because every maintenance op moves
  * file-level state monotonically under the append-only invariants the
  * old row-count token already relied on:
  *  - build / append / merge / compact all APPEND lineage rows via
  *    parquet Append writes, which only ever ADD visible part files
  *    (existing files are never rewritten) — lineage file count is
  *    strictly increasing per op;
  *  - at a FIXED lineage count only markDeleted runs, appending
  *    tombstone part files — tombstone files+bytes strictly increase;
  *  - compact clears the tombstone dir but always appends lineage, so
  *    the pair is still lexicographically MONOTONIC and no maintenance
  *    sequence can restore an earlier token (no ABA) — which is what
  *    lets a cache swap generations forward-only.
  */
object ServingToken {
  type Token = (Long, Long)

  /** Probe the current token — two driver-side FS listings, no job. */
  def version(spark: SparkSession, indexDir: String): Token = {
    val (linFiles, _) =
      IndexBuilder.dirFileSummary(spark, IndexBuilder.lineageDir(indexDir))
    val (tombFiles, tombBytes) =
      IndexBuilder.dirFileSummary(spark, IndexBuilder.tombstonesDir(indexDir))
    (linFiles, tombFiles + tombBytes)
  }

  /** Strict lexicographic "a is newer than b": lineage rows are
    * append-only, and at a fixed lineage count tombstones only
    * accumulate (markDeleted appends; compact clears them but appends
    * lineage). The swap path only moves FORWARD under this order — a
    * thread holding a stale probe must never replace a generation that
    * already advanced past it.
    */
  def isNewer(a: Token, b: Token): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 > b._2)

  /** Multi-shard token order: any component strictly newer. Each
    * component is monotonic in real time, so a later probe vector is
    * componentwise >= an earlier one and this is a sound forward test.
    */
  def anyNewer(a: Seq[Token], b: Seq[Token]): Boolean =
    a.lazyZip(b).exists((x, y) => isNewer(x, y))
}

/** Generic serving-layer cache + engine hot-reload over a monotonic
  * version token — what the reference's long-lived index servers get
  * for free from an IMMUTABLE mmap'd index (index/indexServer.cpp keeps
  * one HashBlob open forever), re-expressed for a MUTABLE one: repeat
  * queries are memoized per key; when the probed token moves FORWARD
  * the wrapped engine is REBUILT (its cached scans are stale after a
  * compact rewrote partitions) and the result cache drops.
  *
  * Thread-safe: the pthread-per-request model (indexServer.cpp:178-198)
  * — concurrent queries share one engine; the swap is a volatile
  * replace gated on `newer` under the lock, so a racing stale probe can
  * never clobber a fresher generation; a query racing a swap at worst
  * computes against the engine generation it started with (the same
  * guarantee a reloading file server gives).
  */
private[graft] final class ServingCache[T, E, K, V <: AnyRef](
    probe: () => T,
    newer: (T, T) => Boolean,
    mkEngine: () => E,
    maxEntries: Int) {
  require(maxEntries > 0, s"maxEntries must be positive, got $maxEntries")

  /** Per-generation result cache: an ACCESS-ORDERED LinkedHashMap with
    * eldest-entry eviction — a hot key touched between fills survives
    * the bound (the clear-all scheme dumped the whole working set the
    * moment entry maxEntries+1 arrived). Guarded by its own lock; the
    * compute itself runs OUTSIDE the lock (a Spark job must never hold
    * it), so concurrent misses on one key may compute twice — same as
    * the ConcurrentHashMap scheme, and harmless (idempotent queries).
    */
  private final class Gen(val token: T) {
    val engine: E = mkEngine()
    private val map = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
        size() > maxEntries
    }
    def get(key: K): V = map.synchronized(map.get(key))
    def put(key: K, value: V): Unit = map.synchronized { map.put(key, value); () }
  }

  private val hitCount = new LongAdder
  private val missCount = new LongAdder
  private val reloadCount = new LongAdder
  @volatile private var gen: Gen = new Gen(probe())

  /** Cached lookup; `checkVersion = false` skips the staleness probe
    * for callers that re-validate out of band (serve-path fast mode).
    */
  def lookup(key: K, checkVersion: Boolean)(compute: E => V): V = {
    var g = gen
    if (checkVersion) {
      val v = probe()
      if (v != g.token) {
        synchronized {
          // re-check under the lock, and swap only FORWARD
          if (newer(v, gen.token)) {
            gen = new Gen(v)
            reloadCount.increment()
          }
        }
        g = gen
      }
    }
    val cached = g.get(key)
    if (cached != null) { hitCount.increment(); return cached }
    missCount.increment()
    val res = compute(g.engine)
    g.put(key, res)
    res
  }

  /** (cache hits, misses, engine reloads) — observability counters. */
  def stats: (Long, Long, Long) =
    (hitCount.sum, missCount.sum, reloadCount.sum)

  /** The current engine generation (tests + advanced callers). */
  def engine: E = gen.engine
}

/** BM25 serving cache over one index — see [[ServingCache]]. Memoizes
  * the WHOLE ranked-retrieval family a server actually exposes (plain /
  * fielded / proximity / QL / champion / champion-fielded /
  * champion-proximity), keyed by (method, normalized terms, every
  * scoring parameter) so two rankers — or one ranker at two parameter
  * settings — can never alias; all share the one engine generation and
  * the one (lineage, tombstone) invalidation.
  */
class Bm25Serving(spark: SparkSession, indexDir: String,
                  maxEntries: Int = 1024) {

  /** `method` discriminates the ranker; parameters a method does not
    * use stay at fixed sentinels so they cannot split its key space.
    * Terms are CANONICALIZED (distinct + sorted) in the key AND in the
    * computation, so two orderings of one term set share one cache row
    * and one deterministic answer — sound because every served ranker
    * is term-SET semantics (proximity's pair boosts are symmetric in
    * value; only last-ulp float summation order could differ, and the
    * canonical order fixes even that).
    */
  private final case class Key(method: String, terms: Seq[String], k: Int,
                               mode: Bm25Engine.Mode, wand: Boolean,
                               m: Int, wBody: Double, wTitle: Double,
                               window: Int, mu: Double)
  private def key(method: String, terms: Seq[String], k: Int,
                  mode: Bm25Engine.Mode = Bm25Engine.Or,
                  wand: Boolean = false, m: Int = 0, wBody: Double = 0.0,
                  wTitle: Double = 0.0, window: Int = 0,
                  mu: Double = 0.0): Key =
    Key(method, terms, k, mode, wand, m, wBody, wTitle, window, mu)

  private val cache =
    new ServingCache[ServingToken.Token, Bm25Engine, Key, Seq[Bm25.Hit]](
      () => ServingToken.version(spark, indexDir),
      ServingToken.isNewer,
      () => new Bm25Engine(spark, indexDir),
      maxEntries)

  def searchTerms(terms: Seq[String], k: Int,
                  mode: Bm25Engine.Mode = Bm25Engine.Or,
                  useWand: Boolean = true,
                  checkVersion: Boolean = true): Seq[Bm25.Hit] = {
    val ts = terms.distinct.sorted
    cache.lookup(key("bm25", ts, k, mode, useWand), checkVersion)(
      _.searchTerms(ts, k, mode, useWand))
  }

  def searchTermsFielded(terms: Seq[String], k: Int, wBody: Double = 1.0,
                         wTitle: Double = 2.5,
                         checkVersion: Boolean = true): Seq[Bm25.Hit] = {
    val ts = terms.distinct.sorted
    cache.lookup(key("bm25f", ts, k, wBody = wBody, wTitle = wTitle),
      checkVersion)(_.searchTermsFielded(ts, k, wBody, wTitle))
  }

  def searchTermsProximity(terms: Seq[String], k: Int, window: Int = 5,
                           checkVersion: Boolean = true): Seq[Bm25.Hit] = {
    val ts = terms.distinct.sorted
    cache.lookup(key("prox", ts, k, window = window), checkVersion)(
      _.searchTermsProximity(ts, k, window))
  }

  def searchTermsQl(terms: Seq[String], k: Int, mu: Double = 300.0,
                    checkVersion: Boolean = true): Seq[Bm25.Hit] = {
    val ts = terms.distinct.sorted
    cache.lookup(key("ql", ts, k, mu = mu), checkVersion)(
      _.searchTermsQl(ts, k, mu))
  }

  def searchTermsChampion(terms: Seq[String], k: Int, m: Int = 64,
                          checkVersion: Boolean = true): Seq[Bm25.Hit] = {
    val ts = terms.distinct.sorted
    cache.lookup(key("champ", ts, k, m = m), checkVersion)(
      _.searchTermsChampion(ts, k, m))
  }

  def searchTermsFieldedChampion(terms: Seq[String], k: Int, m: Int = 64,
                                 wBody: Double = 1.0, wTitle: Double = 2.5,
                                 checkVersion: Boolean = true): Seq[Bm25.Hit] = {
    val ts = terms.distinct.sorted
    cache.lookup(key("bm25fchamp", ts, k, m = m, wBody = wBody,
        wTitle = wTitle), checkVersion)(
      _.searchTermsFieldedChampion(ts, k, m, wBody, wTitle))
  }

  def searchTermsProximityChampion(terms: Seq[String], k: Int, m: Int = 64,
                                   window: Int = 5,
                                   checkVersion: Boolean = true): Seq[Bm25.Hit] = {
    val ts = terms.distinct.sorted
    cache.lookup(key("proxchamp", ts, k, m = m, window = window),
      checkVersion)(_.searchTermsProximityChampion(ts, k, m, window))
  }

  def stats: (Long, Long, Long) = cache.stats
  def engine: Bm25Engine = cache.engine
}

object Bm25Serving {
  /** Kept as the documented token-order entry point (ServingSpec pins
    * it); the implementation lives in [[ServingToken.isNewer]].
    */
  private[graft] def isNewer(a: (Long, Long), b: (Long, Long)): Boolean =
    ServingToken.isNewer(a, b)
}

/** Reference-score serving cache over one index: memoizes
  * [[SearchEngine.search]] per (query, topK) with the same
  * (lineage, tombstone) invalidation and forward-only hot reload as
  * [[Bm25Serving]] — the RefScore family previously had no cache
  * analog, so every repeat parity query re-ran its kernel jobs.
  * `chunkCapacity` defaults to the persisted stats geometry.
  */
class RefServing(spark: SparkSession, indexDir: String,
                 maxEntries: Int = 1024,
                 chunkCapacity: Long = -1L) {

  private val cap: Long =
    if (chunkCapacity > 0L) chunkCapacity
    else Federation.sharedChunkDocs(spark, Seq(indexDir))

  private val cache =
    new ServingCache[ServingToken.Token, SearchEngine, (String, Int), Seq[DocScore]](
      () => ServingToken.version(spark, indexDir),
      ServingToken.isNewer,
      () => new SearchEngine(spark, indexDir, cap),
      maxEntries)

  def search(query: String, topK: Int = GraftConfig.TopK,
             checkVersion: Boolean = true): Seq[DocScore] =
    cache.lookup((query, topK), checkVersion)(_.search(query, topK))

  def stats: (Long, Long, Long) = cache.stats
  def engine: SearchEngine = cache.engine
}

/** Federated BM25/QL serving cache — completes the serving matrix
  * (single/federated × BM25/RefScore): the token is the VECTOR of
  * per-shard (lineage, tombstone) tokens, and maintenance on ANY shard
  * reloads the whole federated engine (offsets may shift when a shard's
  * high-water moves, and the global df/cf exchanges are memoized per
  * engine, so per-shard reload would be unsound).
  */
class FederatedBm25Serving(spark: SparkSession, shards: Seq[String],
                           maxEntries: Int = 1024) {
  require(shards.nonEmpty, "FederatedBm25Serving: need at least one shard")

  /** method tag + canonicalized terms + parameters, like the
    * single-index family cache — "ql" rows carry mu, "bm25" rows the
    * mode/wand pair, each at fixed sentinels for the other.
    */
  private final case class Key(method: String, terms: Seq[String], k: Int,
                               mode: Bm25Engine.Mode, wand: Boolean,
                               mu: Double)

  private val cache =
    new ServingCache[Seq[ServingToken.Token], FederatedBm25,
                     Key, Seq[Bm25.Hit]](
      () => shards.map(d => ServingToken.version(spark, d)),
      ServingToken.anyNewer,
      () => new FederatedBm25(spark, shards),
      maxEntries)

  def searchTerms(terms: Seq[String], k: Int,
                  mode: Bm25Engine.Mode = Bm25Engine.Or,
                  useWand: Boolean = true,
                  checkVersion: Boolean = true): Seq[Bm25.Hit] = {
    val ts = terms.distinct.sorted
    cache.lookup(Key("bm25", ts, k, mode, useWand, 0.0), checkVersion)(
      _.searchTerms(ts, k, mode, useWand))
  }

  /** Federated Dirichlet QL through the same cache + reload — the
    * cf-exchange is memoized per engine generation, so repeat QL
    * queries pay nothing and any shard's maintenance rebuilds the
    * exchange along with the engine.
    */
  def searchTermsQl(terms: Seq[String], k: Int, mu: Double = 300.0,
                    checkVersion: Boolean = true): Seq[Bm25.Hit] = {
    val ts = terms.distinct.sorted
    cache.lookup(Key("ql", ts, k, Bm25Engine.Or, false, mu), checkVersion)(
      _.searchTermsQl(ts, k, mu))
  }

  def stats: (Long, Long, Long) = cache.stats
  def engine: FederatedBm25 = cache.engine
}

/** Federated RefScore serving cache: the token is the VECTOR of
  * per-shard (lineage, tombstone) tokens, and maintenance on ANY shard
  * reloads the whole federated engine (offsets may shift when a shard's
  * high-water moves, so per-shard reload would be unsound). Forward
  * order = any component strictly newer ([[ServingToken.anyNewer]]).
  */
class FederatedRefServing(spark: SparkSession, shards: Seq[String],
                          maxEntries: Int = 1024) {
  require(shards.nonEmpty, "FederatedRefServing: need at least one shard")

  private val cache =
    new ServingCache[Seq[ServingToken.Token], FederatedSearch,
                     (String, Int), Seq[DocScore]](
      () => shards.map(d => ServingToken.version(spark, d)),
      ServingToken.anyNewer,
      () => new FederatedSearch(spark, shards),
      maxEntries)

  def search(query: String, topK: Int = GraftConfig.TopK,
             checkVersion: Boolean = true): Seq[DocScore] =
    cache.lookup((query, topK), checkVersion)(_.search(query, topK))

  def stats: (Long, Long, Long) = cache.stats
  def engine: FederatedSearch = cache.engine
}
