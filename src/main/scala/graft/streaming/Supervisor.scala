package graft.streaming

import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryException}

/** I1 — restart supervision (reference: lib/walex/supervisor.ex:26-75,
  * lib/walex/replication/supervisor.ex:17-42).
  *
  * The reference restarts the (Publisher, Server) pair `one_for_all`
  * because the relation registry and open transactions live in process
  * state. Here that state is either rebuilt per segment (registry, in the
  * source readers) or checkpointed (assembler state store), so a restart
  * is simply: start the same query again against the same checkpoint —
  * offsets and open-transaction state resume exactly where they stopped.
  * This class supplies the supervision loop itself: bounded restarts with
  * linear backoff, rethrowing once the budget is exhausted (matching
  * supervisor max_restarts semantics).
  *
  * Delivery note (same as the reference documents for its middleware,
  * README.md:374-381): a batch interrupted mid-`foreachBatch` is replayed
  * on restart — handlers see at-least-once per batch and should be
  * idempotent on `batchId`.
  */
final class Supervisor(maxRestarts: Int = 10, backoffMs: Long = 100) {

  @volatile private var restartCount = 0
  def restarts: Int = restartCount

  /** Run `start` to completion, restarting the query (same checkpoint →
    * resume) on streaming failure up to `maxRestarts` times.
    */
  def runBlocking(start: () => StreamingQuery): Unit = {
    var attempts = 0
    var done = false
    while (!done) {
      val q = start()
      try {
        q.awaitTermination()
        done = true
      } catch {
        case e: StreamingQueryException =>
          attempts += 1
          restartCount = attempts
          if (attempts > maxRestarts) throw e
          Thread.sleep(backoffMs * attempts)
      }
    }
  }
}
