package graft.tools

/** Gate-scaffolding time accumulator for the bench: composition gates that
  * spawn a second JVM (c15's crash-forge child) spend most of their wall
  * clock on JVM boot + Spark-session lifecycle, not on query plans. They
  * record that scaffolding here; [[graft.Bench]] drains the accumulator
  * around every timed execution and reports `plan_cost` (total minus
  * scaffolding) beside `total` in the contract line — so a c15-class gate
  * cannot mask a real engine drift, and a lifecycle drift cannot
  * masquerade as one. Thread-safe (streams/hooks may record from worker
  * threads); nanos internally so concurrent adds never lose fractions. */
object GateLifecycle {
  private val acc = new java.util.concurrent.atomic.AtomicLong(0L)
  /** Record `sec` seconds of gate scaffolding (JVM spawn, session boot). */
  def add(sec: Double): Unit = { acc.addAndGet((sec * 1e9).toLong); () }
  /** Return and reset the accumulated seconds. */
  def drainSec(): Double = acc.getAndSet(0L) / 1e9
}
