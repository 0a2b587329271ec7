package graft.table

import org.apache.hadoop.fs.{FileSystem, Path}

/**
 * Process-wide cache for the tiny single-file ACL stores
 * (`<warehouse>/<ns>/_acl.json`, `<warehouse>/_tag_acl.json`).
 *
 * Why: every governed statement resolves at least one of these stores
 * per referenced table (several for temp-view snapshot validation), and
 * an uncached open/read is a storage round-trip per statement — a real
 * per-query latency tax on object stores even when no grants exist
 * (ADVICE r11; the reference's LakeFormation equivalent is a regional
 * service call the client SDK caches).
 *
 * Freshness contract:
 *  - within [[TtlMs]] of the last probe the cached value is served with
 *    ZERO filesystem calls (grants change rarely; a grant issued by
 *    ANOTHER process becomes visible within one TTL);
 *  - past the TTL, one `getFileStatus` round-trip revalidates: an
 *    unchanged (mtime, length) keeps the parsed value, anything else
 *    re-reads. Like the commit-header cache, a same-length rewrite
 *    within the filesystem's mtime granularity can slip the probe —
 *    which is why every in-process writer MUST call [[invalidate]]
 *    (both `store` doors do), keeping same-JVM grant changes, and the
 *    live temp-view stale-grant invalidation that depends on them,
 *    exact rather than eventually consistent.
 */
private[table] object AclFileCache {

  /** Positive AND negative revalidation interval. Small: the cost past
    * it is one status probe, and cross-process grant changes should
    * land fast (a revoked principal staying live for minutes would be
    * a real policy gap; 2 s is at worst one in-flight statement). */
  private val TtlMs = 2000L

  private case class Entry(props: Map[String, String],
      mtime: Long, len: Long, probedAt: Long)

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  /** Load `p` through the cache; `read` produces the parsed map from
    * the file bytes (called only on miss/change). */
  def load(fs: FileSystem, p: Path,
      read: () => Map[String, String]): Map[String, String] = {
    val key = p.toString
    val now = System.currentTimeMillis()
    val cached = cache.get(key)
    if (cached != null && now - cached.probedAt < TtlMs) return cached.props
    val st =
      try Some(fs.getFileStatus(p))
      catch { case _: java.io.FileNotFoundException => None }
    st match {
      case None =>
        cache.put(key, Entry(Map.empty, -1L, -1L, now))
        Map.empty
      case Some(s)
          if cached != null && cached.mtime == s.getModificationTime &&
            cached.len == s.getLen =>
        cache.put(key, cached.copy(probedAt = now))
        cached.props
      case Some(s) =>
        val props = read()
        cache.put(key, Entry(props, s.getModificationTime, s.getLen, now))
        props
    }
  }

  /** Writer-side invalidation — the next load re-reads unconditionally
    * (same-JVM grant changes must be exact, not TTL-eventual). */
  def invalidate(p: Path): Unit = cache.remove(p.toString)
}
