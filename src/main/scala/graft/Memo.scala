package graft

import java.util.concurrent.ConcurrentHashMap

/** Lock-scope-safe memoization for caches whose compute runs Spark
  * jobs (ADVICE r13): `ConcurrentHashMap.computeIfAbsent(k, f)` holds
  * the key's BIN lock for f's whole duration — a multi-second Spark
  * job inside f serializes every concurrent caller whose key hashes
  * to the same bin (the 8-way bench), and a re-entrant compute on the
  * same bin throws IllegalStateException. Here the map only ever
  * stores a cheap lazy holder (putIfAbsent is O(1) under the bin
  * lock); the expensive compute runs under the HOLDER's own monitor,
  * so same-key callers still deduplicate the work while different-key
  * callers never contend.
  */
private[graft] final class Memo[K, V] {
  // `computed` flips only after f() returned — so peek can tell a
  // successfully-memoized holder from one whose first compute THREW
  // (a Scala lazy val retries a failed initializer on the next force:
  // peek would otherwise re-run a full Spark build, or rethrow, inside
  // a cache-CLEAR path)
  private final class Holder(f: () => V) {
    @volatile var computed = false
    lazy val value: V = { val v = f(); computed = true; v }
  }
  private val map = new ConcurrentHashMap[K, Holder]()

  /** The memoized value for `key`, computing `f` at most once per key
    * (subsequent and concurrent callers get the first call's result).
    */
  def get(key: K)(f: => V): V = {
    var h = map.get(key)
    if (h == null) {
      val nh = new Holder(() => f)
      val prev = map.putIfAbsent(key, nh)
      h = if (prev == null) nh else prev
    }
    h.value
  }

  /** The value for `key` if it has been computed (never computes —
    * a holder whose compute failed reads as absent).
    */
  def peek(key: K): Option[V] =
    Option(map.get(key)).filter(_.computed).map(_.value)

  /** Store a pre-computed value (overwrites any holder). */
  def put(key: K, value: V): Unit = {
    val h = new Holder(() => value)
    h.value // force now, so peek never runs a thunk
    map.put(key, h)
    ()
  }

  def keys: Seq[K] = {
    import scala.jdk.CollectionConverters._
    map.keySet().asScala.toSeq
  }

  def remove(key: K): Unit = { map.remove(key); () }
  def clear(): Unit = map.clear()
  def size: Int = map.size()
}
