package graft.enrich

/** Shared JVM-wide codec configuration — the ONE place the ImageIO
  * stream-cache policy lives.
  *
  * ImageIO's default stream cache is DISK-backed: every read/write on a
  * non-file stream creates, fills, and deletes an `imageio*.tmp` in
  * `java.io.tmpdir`. On the graft codec paths that is several temp-file
  * round trips per media row across 32 threads — measured ~1.5–2×
  * slower per op than the memory cache AND the dominant run-to-run
  * variance source (the cost tracks tmp-FS/page-cache state, not the
  * work; r17 root cause of qm3/qm4/qs24's variance). Every graft payload
  * is an in-memory byte array, so the memory cache is strictly better.
  *
  * The flip is process-global (it also affects any other ImageIO user in
  * the JVM — acceptable here: graft owns the benchmark JVM, and embedded
  * users can re-enable per-stream via explicit FileCacheImageInputStream
  * if they ever need spill-to-disk for huge streams).
  *
  * REGRESSION GUARD: the setting used to be object-init in each codec
  * class independently; a future codec class that loads first and reads
  * before the others initialize would silently revert its own reads to
  * the disk cache. Centralizing it here — with every ImageIO-using codec
  * object calling [[ensureImageIoMemoryCache]] from its own initializer —
  * makes the order irrelevant, and `CodecsSpec` asserts the JVM-wide
  * state after touching each codec entry point.
  */
object Codecs {

  /** Idempotent; safe to call from every codec object's initializer. */
  def ensureImageIoMemoryCache(): Unit =
    javax.imageio.ImageIO.setUseCache(false)

  ensureImageIoMemoryCache()
}
