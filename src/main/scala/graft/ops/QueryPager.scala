package graft.ops

import org.apache.spark.sql.DataFrame

/** One page of a paginated query result — the Spark analogue of the
  * reference's paged result object (reference: src/query_stream.rs and
  * tests/streaming_query_test.rs:27-70: page index, page_size, total,
  * data, has_more, is_first_page/is_last_page/total_pages). `data` stays
  * a lazy DataFrame slice; materialize it with collect/show as needed. */
final case class QueryPage(page: Int, pageSize: Int, total: Long,
                           data: DataFrame) {
  def hasMore: Boolean = (page.toLong + 1L) * pageSize < total
  def isFirstPage: Boolean = page == 0
  def isLastPage: Boolean = totalPages > 0 && page.toLong == totalPages - 1
  // integer ceil-div in Long: exact for any total (a Double round-trip
  // loses precision past 2^53, an Int truncation overflows past 2^31)
  def totalPages: Long = (total + pageSize - 1) / pageSize
}

/** Cursor-style pagination over ANY DataFrame carrying a deterministic
  * total order — the ergonomic surface of the reference's streaming
  * query pager (query_stream.rs: next_page / has_more / progress on
  * StreamStats; cypher/streaming.rs:112 QueryCursor::with_query for
  * Cypher results). The ordered frame is cached, so page boundaries
  * are stable across fetches and each page is an offset/limit slice of
  * the same frame, never a re-execution of the upstream query. The
  * total is computed once up front (it doubles as the cache warm-up);
  * call [[close]] to release the cached frame.
  *
  * Build one from a [[GraphQuery]] (orderKey asc, id tiebreak) via the
  * public constructor, or from any (DataFrame, total-order keys) —
  * e.g. a compiled Cypher result — via [[QueryPager.of]] /
  * [[graft.cypher.Cypher.pager]]. */
final class QueryPager private (orderedIn: DataFrame, val pageSize: Int) {
  require(pageSize > 0, "pageSize must be positive")

  /** Pager over a [[GraphQuery]]: one deterministic total order
    * (orderKey asc, id tiebreak — [[GraphQuery.orderBy]]). */
  def this(q: GraphQuery, orderKey: String, pageSize: Int) =
    this(q.orderBy(orderKey, ascending = true).df, pageSize)

  private val ordered = orderedIn.cache()

  /** Total result rows (StreamStats.total_count). */
  val total: Long = ordered.count()

  def totalPages: Long = (total + pageSize - 1) / pageSize

  /** Random-access page fetch (query_paginated(page, page_size)). */
  def page(i: Int): QueryPage = {
    require(i >= 0, "page index must be non-negative")
    // the offset is computed in Long: i * pageSize as Int overflows
    // beyond ~2^31 rows; Dataset.offset itself only takes an Int, so
    // deeper slices fail loudly instead of wrapping negative
    val off = i.toLong * pageSize
    require(off <= Int.MaxValue.toLong,
      s"page offset $off exceeds the Int range of Dataset.offset")
    QueryPage(i, pageSize, total,
      ordered.offset(off.toInt).limit(pageSize))
  }

  // ---- cursor walk (next_page / has_more / progress) ----
  private var cursor = 0

  def hasMore: Boolean = cursor.toLong * pageSize < total

  def nextPage(): QueryPage = {
    val p = page(cursor)
    cursor += 1
    p
  }

  /** Fraction of rows the cursor has walked past, 1.0 when exhausted
    * (StreamStats.progress: an empty result is complete). */
  def progress: Double =
    if (total == 0L) 1.0
    else math.min(1.0, (cursor.toLong * pageSize).toDouble / total)

  def close(): Unit = ordered.unpersist()
}

object QueryPager {
  /** Pager over any DataFrame: `orderKeys` (ascending) must give a
    * TOTAL order — include a unique tiebreak column, or page
    * boundaries are undefined under Spark's unstable sort. */
  def of(df: DataFrame, orderKeys: Seq[String], pageSize: Int): QueryPager = {
    require(orderKeys.nonEmpty, "a total-order key is required")
    new QueryPager(
      df.orderBy(orderKeys.map(org.apache.spark.sql.functions.col): _*), pageSize)
  }
}
