package graft.tsdb

/** Label model mirroring the reference's labeled-time-series abstraction.
  *
  * Reference semantics (see SURVEY.md §1.1):
  *  - a series identity is a sorted list of (name, value) string pairs
  *    (`vendor/github.com/prometheus/tsdb/labels/labels.go:28-38`);
  *  - the metric name is just another label, `__name__`
  *    (`server.go:165-172`);
  *  - label sets have a total lexicographic order on (name, value) pairs,
  *    shorter set first (`labels/labels.go:140-156`) — all series sets are
  *    merged in that order;
  *  - empty label value is equivalent to the label being absent
  *    (`querier.go:189-195`).
  */
final case class Label(name: String, value: String)

object Labels {
  val MetricName = "__name__"

  /** Canonical form: unique names, sorted by name, no empty values.
    * Mirrors the invariant enforced at TSDB index-write time
    * (`vendor/.../tsdb/index.go:266`). */
  def canonical(labels: Seq[Label]): Seq[Label] =
    labels.filter(_.value.nonEmpty).sortBy(_.name)

  def fromMap(m: Map[String, String]): Seq[Label] =
    canonical(m.toSeq.map { case (n, v) => Label(n, v) })

  /** Total order over label sets: element-wise on (name, value), shorter
    * set first — the reference's `labels.Compare`
    * (`labels/labels.go:140-156`). Load-bearing: cross-block series merge
    * iterates in this order (`querier.go:358-388`). */
  val ordering: Ordering[Seq[Label]] = new Ordering[Seq[Label]] {
    def compare(a: Seq[Label], b: Seq[Label]): Int = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val c1 = a(i).name.compareTo(b(i).name)
        if (c1 != 0) return c1
        val c2 = a(i).value.compareTo(b(i).value)
        if (c2 != 0) return c2
        i += 1
      }
      a.length - b.length
    }
  }

  /** Stable 64-bit fingerprint of a canonical label set — the grouping /
    * sort key used instead of carrying the full array through shuffles.
    * Same role as `labels.Hash` (`labels/labels.go:58-68`); the exact hash
    * function is an implementation detail (we use FNV-1a over
    * name\xff value\xff), only stability matters. */
  def fingerprint(labels: Seq[Label]): Long = {
    var h = 0xcbf29ce484222325L // FNV offset basis
    def mix(s: String): Unit = {
      var i = 0
      while (i < s.length) {
        h ^= s.charAt(i).toLong
        h *= 0x100000001b3L // FNV prime
        i += 1
      }
      h ^= 0xff
      h *= 0x100000001b3L
    }
    canonical(labels).foreach { l => mix(l.name); mix(l.value) }
    h
  }
}

/** One raw sample: timestamp in epoch milliseconds, float64 value — the
  * only value type in the reference (`chunks/chunk.go:66-70`,
  * `remote.proto:18-21`). */
final case class Sample(t: Long, v: Double)

/** One series of a query result: identity + time-ordered samples.
  * Mirrors the remote-read `TimeSeries`/`SampleStream` response shape
  * (`remote.proto:28-32`, `vendor/.../common/model/value.go:223`). */
final case class SampleStream(labels: Map[String, String], samples: Seq[Sample])
