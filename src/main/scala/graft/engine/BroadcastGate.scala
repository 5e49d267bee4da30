package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared sizing gate for driver-resident sidecars (the mmap-resident
  * HashFile analog, index/HashBlob.h:364-391): ONE aggregate job
  * estimates (rows, bytes) of a prospective broadcast and both engines
  * gate on BOTH caps — a row cap alone would let a 2M-row sidecar of
  * long strings pull hundreds of MB through the driver; a byte cap alone
  * would still build a huge driver-side map of tiny rows.
  */
private[engine] object BroadcastGate {

  /** (rows, estimated payload bytes) for `df`, where `perRowBytes` is the
    * per-row payload estimate (variable-width columns summed + a fixed
    * overhead for primitives/headers).
    */
  def size(df: DataFrame, perRowBytes: Column): (Long, Long) = {
    val row = df.agg(count(lit(1)), coalesce(sum(perRowBytes), lit(0L))).head()
    (row.getLong(0), row.getLong(1))
  }

  def fits(df: DataFrame, perRowBytes: Column,
           maxRows: Long, maxBytes: Long): Boolean = {
    val (rows, bytes) = size(df, perRowBytes)
    rows <= maxRows && bytes <= maxBytes
  }
}
