package graft.sources

/** Retry with capped exponential backoff — the write-path resilience
  * of the reference's MySQL writer (reference:
  * src/writers/optimized_mysql_writer.py: retry loop with backoff
  * around batched upserts). Kept engine-agnostic: wrap any action
  * (JDBC write, snapshot swap, external-service call).
  *
  * `sleep` is injectable so specs verify the backoff schedule without
  * actually sleeping.
  */
object Retry {

  final class RetriesExhausted(attempts: Int, cause: Throwable)
    extends RuntimeException(s"action failed after $attempts attempts", cause)

  def withRetry[T](attempts: Int,
                   initialBackoffMs: Long = 500L,
                   maxBackoffMs: Long = 30000L,
                   onRetry: (Int, Throwable) => Unit = (n, e) =>
                     System.err.println(s"[graft] retry $n after: ${e.getMessage}"),
                   sleep: Long => Unit = Thread.sleep)(f: => T): T = {
    require(attempts >= 1, "need at least one attempt")
    var backoff = initialBackoffMs
    var attempt = 1
    while (true) {
      try return f
      catch {
        // NonFatal only: an OutOfMemoryError or an interrupt is not a
        // transient write failure — retrying masks fatal state and
        // delays shutdown
        case scala.util.control.NonFatal(e) =>
          if (attempt >= attempts) throw new RetriesExhausted(attempts, e)
          onRetry(attempt, e)
          try sleep(backoff)
          catch {
            case ie: InterruptedException =>
              Thread.currentThread().interrupt()
              throw new RetriesExhausted(attempts, ie)
          }
          backoff = math.min(backoff * 2, maxBackoffMs)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
