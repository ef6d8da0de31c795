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
  private final class Holder(f: () => V) { lazy val value: V = f() }
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

  /** The value for `key` if it has been computed (never computes). */
  def peek(key: K): Option[V] =
    Option(map.get(key)).map(_.value)

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
