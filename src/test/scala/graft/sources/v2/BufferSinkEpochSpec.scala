package graft.sources.v2

import org.scalatest.funsuite.AnyFunSuite

/** Exactly-once at the streaming sink seam: Structured Streaming can REPLAY
  * an epoch's commit (driver dies after the sink published but before the
  * checkpoint commit log recorded the epoch) — the sink must dedupe on the
  * epoch id or every crash-resume duplicates the replayed batch's rows.
  * BufferSink is the reference V2 sink shape real sinks copy, so it carries
  * the txn-identity dedup (the TableStore change-log (flow, batch)
  * precedent). */
class BufferSinkEpochSpec extends AnyFunSuite {

  test("a replayed epoch publishes once; distinct epochs accumulate; clear resets") {
    BufferSink.clear("epochs")
    BufferSink.publishEpoch("epochs", 0L, Seq(Seq(1), Seq(2)))
    BufferSink.publishEpoch("epochs", 0L, Seq(Seq(1), Seq(2))) // crash replay
    assert(BufferSink.rows("epochs").size == 2)
    BufferSink.publishEpoch("epochs", 1L, Seq(Seq(3)))
    assert(BufferSink.rows("epochs").size == 3)
    // clear drops the committed-epoch memory too: a fresh stream over a
    // cleared buffer legitimately restarts at epoch 0
    BufferSink.clear("epochs")
    BufferSink.publishEpoch("epochs", 0L, Seq(Seq(9)))
    assert(BufferSink.rows("epochs") == Seq(Seq(9)))
  }
}
