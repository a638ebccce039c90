package graft.llm

/** Last-guard-event register: each scale guard (bucket caps, the
  * cosineNearDups enumeration monitor) records its most recent warning
  * here alongside the slf4j WARN it emits. Two consumers: production
  * debugging of a long pipeline where the log line scrolled away
  * ("which guard engaged, and with what numbers?"), and specs that
  * must assert a warn FIRED without scraping the logging backend —
  * the enumeration monitor in particular changes no rows by design,
  * so the register is its only programmatic observable.
  *
  * Keyed by operator name; a new event for an operator replaces the
  * previous one. Thread-safe (concurrent queries may guard at once).
  */
object GuardEvents {
  private val last =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[llm] def record(op: String, msg: String): Unit = last.put(op, msg)

  /** The most recent warning this operator recorded, if any. */
  def lastFor(op: String): Option[String] = Option(last.get(op))

  def clear(op: String): Unit = last.remove(op)
}
