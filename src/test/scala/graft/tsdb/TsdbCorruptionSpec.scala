package graft.tsdb

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite

/** Corruption battery for the on-disk block formats: at 100 TB some
  * file WILL arrive damaged (bit rot, truncated upload, torn write),
  * and the failure mode that matters is SILENT WRONG DATA. The
  * property checked here is total: for EVERY single-byte mutation of
  * the index and of a chunks segment (exhaustive, not sampled), a full
  * decode either raises an exception or returns exactly the baseline —
  * a corrupted block can fail a query, it can be harmlessly ignored in
  * unread padding, but it can never quietly change a result. Torn
  * tails (truncation) and a garbage meta.json get the same contract.
  *
  * Why this holds by construction: every index section and every chunk
  * record carries a CRC-32C over its payload (the lengths outside the
  * CRC can misdirect the read, but then the CRC check lands on the
  * wrong window and fails with probability 1 − 2⁻³²; the battery
  * verifies no mutation in THIS corpus finds the bad window). */
class TsdbCorruptionSpec extends AnyFunSuite {

  private def corpus: Seq[(Seq[Label], Seq[Sample])] =
    for {
      job <- Seq("api", "web"); inst <- (0 to 2).map("i-" + _)
    } yield (
      Seq(Label("__name__", "up"), Label("job", job), Label("instance", inst)),
      (0 until 120).map(i => Sample(1700000000000L + i * 15000L,
        ((i * 7919 + job.length) % 97).toDouble)))

  /** Full LOCAL block decode through the same readers the DSv2 scan
    * uses, over the WHOLE reader surface: series + chunk records + XOR
    * samples, plus the postings and label-value sections (so mutations
    * there are exercised, not just skipped over). */
  private def readAll(index: Array[Byte], chunks: Array[Byte]): (Seq[(Seq[Label], Seq[Sample])], Seq[Long], Map[String, Seq[String]]) = {
    val idx = new TsdbIndex.IndexReader(index)
    val series = idx.allSeries.map { s =>
      (s.labels, s.chunks.flatMap { cm =>
        XorChunk.decode(ChunkFile.readAt(chunks, ChunkFile.refOffset(cm.ref)).data)
      })
    }
    val names = series.flatMap(_._1.map(_.name)).distinct.sorted
    val values = names.map(n => n -> idx.labelValues(n)).toMap
    val postings = idx.allPostings ++
      names.flatMap(n => values(n).flatMap(v => idx.postings(n, v)))
    (series, postings, values)
  }

  private lazy val dir: Path = {
    val d = Files.createTempDirectory("graft-corrupt")
    TsdbBlock.write(d, corpus, TsdbBlock.syntheticUlid(77))
    d
  }
  private lazy val indexBytes = Files.readAllBytes(dir.resolve("index"))
  private lazy val chunkBytes = Files.readAllBytes(dir.resolve("chunks/000001"))
  private lazy val baseline = readAll(indexBytes, chunkBytes)

  /** Run one mutated decode; returns true if it threw, false if it
    * returned the baseline; fails the suite on silent wrong data.
    * JVM Errors (OOM, stack overflow) are NOT acceptable — rethrown. */
  private def trial(index: Array[Byte], chunks: Array[Byte], what: String): Boolean =
    try {
      val got = readAll(index, chunks)
      assert(got == baseline, s"SILENT WRONG DATA on $what")
      false
    } catch {
      // the failed equality assertion MUST escape — ScalaTest's
      // TestFailedException is a RuntimeException, so a bare
      // `case _: Exception` would swallow the battery's entire purpose
      case e: org.scalatest.exceptions.TestFailedException => throw e
      case _: Exception => true
    }

  test("every single-byte index mutation: exception or baseline, never wrong data") {
    assert(baseline._1.map(_._2.size).sum == corpus.map(_._2.size).sum)
    var threw = 0
    for (pos <- indexBytes.indices) {
      val m = indexBytes.clone()
      m(pos) = (m(pos) ^ 0x3c).toByte
      if (trial(m, chunkBytes, s"index[$pos]")) threw += 1
    }
    // the format is CRC-dense: the overwhelming majority of mutations
    // must be DETECTED, not just harmless
    assert(threw > indexBytes.length * 8 / 10,
      s"only $threw/${indexBytes.length} index mutations detected")
  }

  test("every single-byte chunks mutation: exception or baseline, never wrong data") {
    var threw = 0
    for (pos <- chunkBytes.indices) {
      val m = chunkBytes.clone()
      m(pos) = (m(pos) ^ 0x3c).toByte
      if (trial(indexBytes, m, s"chunks[$pos]")) threw += 1
    }
    assert(threw > chunkBytes.length * 8 / 10,
      s"only $threw/${chunkBytes.length} chunk mutations detected")
  }

  test("second mutation pattern (xor 0xff) holds the same contract") {
    for (pos <- indexBytes.indices by 7) {
      val m = indexBytes.clone(); m(pos) = (m(pos) ^ 0xff).toByte
      trial(m, chunkBytes, s"index[$pos]^ff")
    }
    for (pos <- chunkBytes.indices by 7) {
      val m = chunkBytes.clone(); m(pos) = (m(pos) ^ 0xff).toByte
      trial(indexBytes, m, s"chunks[$pos]^ff")
    }
  }

  test("torn tails: every truncation of index or chunks throws") {
    for (keep <- Seq(0, 1, 7, indexBytes.length / 2, indexBytes.length - 1)) {
      assertThrows[Exception](readAll(indexBytes.take(keep), chunkBytes))
    }
    // a truncated chunks segment must throw once a read crosses the cut
    val cut = chunkBytes.length / 2
    assertThrows[Exception](readAll(indexBytes, chunkBytes.take(cut)))
  }

  test("garbage meta.json throws, never a default block") {
    val d = Files.createTempDirectory("graft-badmeta")
    Files.write(d.resolve("meta.json"), "{not json".getBytes)
    assertThrows[Exception](TsdbBlock.readMeta(d))
    Files.write(d.resolve("meta.json"), Array.fill[Byte](64)(0x7f))
    assertThrows[Exception](TsdbBlock.readMeta(d))
  }

  test("tombstones: every single-byte mutation throws or reads the baseline") {
    val d = Files.createTempDirectory("graft-badtomb")
    TsdbBlock.write(d, corpus, TsdbBlock.syntheticUlid(78))
    Tombstones.write(d, Map(
      1L -> Seq((1700000000000L, 1700000900000L)),
      4L -> Seq((1700001000000L, 1700002000000L))))
    val p = d.resolve("tombstones")
    val b = Files.readAllBytes(p)
    val base = Tombstones.read(d)
    for (pos <- b.indices) {
      val m = b.clone(); m(pos) = (m(pos) ^ 0x3c).toByte
      Files.write(p, m)
      try {
        val got = Tombstones.read(d)
        assert(got == base, s"SILENT WRONG TOMBSTONES at byte $pos")
      } catch {
        case e: org.scalatest.exceptions.TestFailedException => throw e
        case _: Exception => ()
      }
    }
    Files.write(p, b)
    assert(Tombstones.read(d) == base)
  }
}
