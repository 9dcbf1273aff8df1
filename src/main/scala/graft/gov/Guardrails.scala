package graft.gov

/** Scan-governance envelope — defaults mirror the reference's shipped config
  * (`sql-processor/config/config.yaml:73-83`, `internal/config/config.go:
  * 197-210`): default_limit 1000, max_unbounded_scan 1000, max_scan_bytes
  * 10 GiB, max_scan_segments 10000, max_rows 100000, timeout 30 s,
  * max_concurrent 20, queue 50.
  */
final case class Guardrails(
    requireTimeBound: Boolean = true,
    defaultLimit: Int = 1000,
    maxRows: Int = 100000,
    maxUnboundedScan: Int = 1000,
    maxScanSegments: Int = 10000,
    maxScanBytes: Long = 10L * 1024 * 1024 * 1024,
    queryTimeoutMs: Long = 30000,
    maxConcurrent: Int = 20,
    queueSize: Int = 50,
    resultCacheTtlMs: Long = 10000,
    resultCacheMaxEntries: Int = 128,
    resultCacheMaxRows: Int = 10000)

/** Pre-flight scan admission (`server.go:2854-2862`): reject before reading
  * when the pruned segment set exceeds the envelope. */
object ScanAdmission {
  final class ScanLimitException(msg: String) extends RuntimeException(msg)

  def admit(segments: Int, bytes: Long, rails: Guardrails): Unit = {
    if (segments > rails.maxScanSegments)
      throw new ScanLimitException(
        s"scan would read $segments segments > max_scan_segments ${rails.maxScanSegments}")
    if (bytes > rails.maxScanBytes)
      throw new ScanLimitException(
        s"scan would read $bytes bytes > max_scan_bytes ${rails.maxScanBytes}")
  }
}
