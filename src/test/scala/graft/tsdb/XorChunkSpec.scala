package graft.tsdb

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** XOR chunk codec: golden bit-level vectors derived from the published
  * format (Gorilla §4.1 / Prometheus TSDB chunk encoding; reference
  * behavior in vendor/github.com/prometheus/tsdb/chunks/xor.go) plus
  * round-trip property tests. */
class XorChunkSpec extends AnyFunSuite {

  test("empty chunk: two-byte zero count") {
    assert(XorChunk.encode(Seq.empty).toSeq == Seq[Byte](0, 0))
    assert(XorChunk.decode(Array[Byte](0, 0)).isEmpty)
  }

  test("single sample golden bytes") {
    // t=5 → zigzag varint 10 = 0x0a; v=1.5 → bits 0x3FF8000000000000
    val enc = XorChunk.encode(Seq(Sample(5, 1.5)))
    val expected = Array[Byte](0, 1, 0x0a,
      0x3f.toByte, 0xf8.toByte, 0, 0, 0, 0, 0, 0)
    assert(enc.toSeq == expected.toSeq)
    assert(XorChunk.decode(enc) == IndexedSeq(Sample(5, 1.5)))
  }

  test("second sample: uvarint delta + xor-zero value bit") {
    // t0=0 (varint 0x00), v=2.0; t1=30000 (uvarint b0=0xb0,0xea,0x01), v=2.0
    // value xor == 0 → single 0 bit
    val enc = XorChunk.encode(Seq(Sample(0, 2.0), Sample(30000, 2.0)))
    // header(2) + 1 + 8 + uvarint 30000 = [0xb0, 0xea, 0x01] + 1 bit → 1 byte
    assert(enc.length == 2 + 1 + 8 + 3 + 1)
    assert((enc.last & 0x80) == 0) // leading 0 bit = xor-same
    assert(XorChunk.decode(enc) == IndexedSeq(Sample(0, 2.0), Sample(30000, 2.0)))
  }

  test("dod=0 encodes as single 0 bit per sample") {
    // regular 15s cadence: after the 2nd sample, each (t,vsame) costs 2 bits
    val regular = (0 until 100).map(i => Sample(i * 15000L, 42.0))
    val enc = XorChunk.encode(regular)
    // 2 header + 1 t0 + 8 v0 + 2 delta uvarint + 1 bit, then 98 * 2 bits
    assert(enc.length <= 2 + 1 + 8 + 2 + 1 + (98 * 2 + 7) / 8 + 1)
    assert(XorChunk.decode(enc) == regular)
  }

  test("dod branch coverage: 14/17/20/64-bit widths") {
    val ts = Seq(0L, 10L, 20L, // dod 0
      20L + 8192L + 10L, // dod 8192 (max 14-bit)
      20L + 8192L + 10L + (8192L + 10L) + 65536L // 17-bit
    )
    val samples = ts.zipWithIndex.map { case (t, i) => Sample(t, i.toDouble) }
    assert(XorChunk.decode(XorChunk.encode(samples)) == samples)
    // extreme jumps → 64-bit branch
    val big = Seq(Sample(0, 1), Sample(1, 2), Sample(1L << 40, 3), Sample((1L << 40) + 1, 4))
    assert(XorChunk.decode(XorChunk.encode(big)) == big)
  }

  test("negative dod (time cadence shrink)") {
    val s = Seq(Sample(0, 1.0), Sample(100, 1.0), Sample(150, 1.0), Sample(160, 1.0))
    assert(XorChunk.decode(XorChunk.encode(s)) == s)
  }

  test("value window reuse and widen") {
    val s = Seq(1.0, 1.5, 1.25, 3.0, -7.5, 0.0, 1e300, -1e-300, Double.MaxValue)
      .zipWithIndex.map { case (v, i) => Sample(i * 1000L, v) }
    assert(XorChunk.decode(XorChunk.encode(s)) == s)
  }

  test("NaN and infinities round-trip") {
    val s = Seq(Sample(0, Double.NaN), Sample(1, Double.PositiveInfinity),
      Sample(2, Double.NegativeInfinity), Sample(3, -0.0))
    val dec = XorChunk.decode(XorChunk.encode(s))
    assert(dec.map(_.t) == s.map(_.t))
    assert(dec.map(x => java.lang.Double.doubleToRawLongBits(x.v)) ==
      s.map(x => java.lang.Double.doubleToRawLongBits(x.v)))
  }

  test("sigbits==64 path (full-width xor, leading=0 trailing=0)") {
    val s = Seq(Sample(0, java.lang.Double.longBitsToDouble(0x0000000000000001L)),
      Sample(1, java.lang.Double.longBitsToDouble(0x8000000000000001L)))
    assert(XorChunk.decode(XorChunk.encode(s)).map(x =>
      java.lang.Double.doubleToRawLongBits(x.v)) ==
      s.map(x => java.lang.Double.doubleToRawLongBits(x.v)))
  }

  test("property: encode/decode round-trip on random monotone series") {
    val sampleGen = for {
      n <- Gen.choose(0, 240)
      t0 <- Gen.choose(0L, 1L << 41)
      deltas <- Gen.listOfN(n, Gen.choose(1L, 120000L))
      vs <- Gen.listOfN(n, Gen.oneOf(
        Gen.choose(-1e6, 1e6), Gen.choose(-10.0, 10.0).map(math.exp),
        Gen.const(0.0), Gen.choose(0L, 1000L).map(_.toDouble)).flatMap(identity(_)))
    } yield deltas.scanLeft(t0)(_ + _).tail.zip(vs).map { case (t, v) => Sample(t, v) }
    (1 to 200).foreach { i =>
      val samples = sampleGen.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i)).get
      assert(XorChunk.decode(XorChunk.encode(samples)) == samples.toIndexedSeq)
    }
  }

  test("compression ratio: counter series ~under 2 bytes/sample") {
    val s = (0 until 120).map(i => Sample(1700000000000L + i * 15000L, 1000.0 + i))
    val bytes = XorChunk.encode(s).length
    assert(bytes.toDouble / s.size < 2.5, s"got $bytes bytes for ${s.size} samples")
  }
}

class ChunkFileSpec extends AnyFunSuite {
  test("segment file round-trip with crc32c validation") {
    val chunks = Seq(
      XorChunk.encode((0 until 10).map(i => Sample(i * 1000L, i.toDouble))),
      XorChunk.encode(Seq(Sample(5, 2.5))),
      XorChunk.encode(Seq.empty))
    val (bytes, refs) = ChunkFile.write(3, chunks)
    assert(refs.size == 3)
    assert(refs.forall(r => ChunkFile.refFileSeq(r) == 3))
    // read back each by (offset within file)
    refs.zip(chunks).foreach { case (ref, orig) =>
      val rec = ChunkFile.readAt(bytes, ChunkFile.refOffset(ref))
      assert(rec.encoding == XorChunk.Encoding)
      assert(rec.data.toSeq == orig.toSeq)
    }
    val all = ChunkFile.readAll(bytes)
    assert(all.map(_.data.toSeq) == chunks.map(_.toSeq))
  }

  test("corrupt byte fails crc") {
    val (bytes, refs) = ChunkFile.write(0, Seq(XorChunk.encode(Seq(Sample(1, 1.0)))))
    bytes(8) = (bytes(8) ^ 0x40).toByte
    assertThrows[IllegalArgumentException] {
      ChunkFile.readAt(bytes, ChunkFile.refOffset(refs.head))
    }
  }

  test("ref packing matches fileSeq<<32|offset") {
    assert(ChunkFile.ref(2, 1234) == ((2L << 32) | 1234L))
    assert(ChunkFile.refFileSeq(ChunkFile.ref(7, 99)) == 7)
    assert(ChunkFile.refOffset(ChunkFile.ref(7, 99)) == 99)
  }

  test("record cache serves repeated reads with zero segment IO (S7)") {
    val chunks = (0 until 20).map(i =>
      XorChunk.encode((0 until 50).map(k =>
        Sample(1700000000000L + k * 15000L, (i * 50 + k).toDouble))))
    val dir = java.nio.file.Files.createTempDirectory("chunkcache")
    val (bytes, refs) = ChunkFile.write(1, chunks)
    java.nio.file.Files.write(dir.resolve("000001"), bytes)
    ChunkFile.bytesFetched.set(0)
    val first = ChunkFile.readRefs(dir, refs)
    assert(ChunkFile.bytesFetched.get() > 0)
    ChunkFile.bytesFetched.set(0)
    val second = ChunkFile.readRefs(dir, refs)
    assert(ChunkFile.bytesFetched.get() == 0,
      "second read of an immutable segment must be served from the cache")
    assert(first.keySet == second.keySet)
    assert(first.forall { case (r, rec) =>
      java.util.Arrays.equals(rec.data, second(r).data) })
    // a partial overlap fetches only the missing records
    val more = ChunkFile.write(2, chunks)._1
    java.nio.file.Files.write(dir.resolve("000002"), more)
    ChunkFile.bytesFetched.set(0)
    val mixed = ChunkFile.readRefs(dir,
      refs.take(5) ++ chunks.indices.take(3).map(i =>
        ChunkFile.ref(2, ChunkFile.refOffset(refs(i)))))
    assert(mixed.size == 8)
    val freshBytes = ChunkFile.bytesFetched.get()
    assert(freshBytes > 0 && freshBytes < bytes.length,
      s"expected only segment-2 ranges, fetched $freshBytes")
  }
}
