package graft.exec

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

/** EventLog.Composite must forward EVERY PipelineHooks method — it
  * predates onBatchCommitted and silently swallowed it for all children
  * (a monitoring listener or crash-halt hook wired through a composite
  * never fired, with zero error). Reflection over the trait's method
  * surface, so the NEXT hook added without a Composite override fails
  * here instead of silently no-oping in production. */
class CompositeHooksSpec extends AnyFunSuite {

  test("Composite forwards every on* hook to every child") {
    val received = mutable.Set[String]()
    val recorder = java.lang.reflect.Proxy.newProxyInstance(
      classOf[PipelineHooks].getClassLoader,
      Array[Class[_]](classOf[PipelineHooks]),
      (_, method, _) => { received.add(method.getName); null }
    ).asInstanceOf[PipelineHooks]
    val composite = new EventLog.Composite(recorder)

    // scala trait defaults also compile to static `onX$(self, ...)`
    // forwarders on the interface — instance methods only
    val hookMethods = classOf[PipelineHooks].getMethods
      .filter(m => m.getName.startsWith("on") && !m.getName.contains("$") &&
        !java.lang.reflect.Modifier.isStatic(m.getModifiers))
    assert(hookMethods.nonEmpty)
    hookMethods.foreach { m =>
      val args: Array[AnyRef] = m.getParameterTypes.map {
        case c if c == classOf[String] => "x": AnyRef
        case c if c == java.lang.Long.TYPE => java.lang.Long.valueOf(1L)
        case c if c == classOf[Map[_, _]] => Map.empty[String, String]
        case c if c == classOf[Option[_]] => None
        case c => sys.error(
          s"CompositeHooksSpec: teach me to synthesize a ${c.getName} " +
            s"for ${m.getName} — a new hook parameter type arrived")
      }
      m.invoke(composite, args: _*)
      assert(received.contains(m.getName),
        s"EventLog.Composite drops ${m.getName} — add the forwarding override")
    }
  }
}
