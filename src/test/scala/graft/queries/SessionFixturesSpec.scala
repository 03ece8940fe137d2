package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The shared fixture-cache lifecycle: session keys are `sessionUUID`
  * (never reused — an identity hash can collide after GC and hand a new
  * session a DataFrame bound to a dead one), and invalidation purges
  * exactly the session's entries from every registered cache. */
class SessionFixturesSpec extends AnyFunSuite {
  test("register/key/invalidate: per-session entries purge, others stay") {
    val spark = SparkSpec.spark
    val m = SessionFixtures.register(
      scala.collection.concurrent.TrieMap[(String, String), Int]())
    val k = SessionFixtures.key(spark)
    assert(k == SessionFixtures.key(spark), "session key must be stable")
    m.put((k, "a"), 1); m.put((k, "b"), 2); m.put(("other-uuid", "a"), 3)
    SessionFixtures.invalidate(k)
    assert(m.keySet == Set(("other-uuid", "a")),
      "invalidate must drop exactly the session's entries")
    m.clear()
  }
}
