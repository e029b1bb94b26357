package graft

import graft.ops.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Byte-level PGM parser: real-decode roundtrip plus malformed-payload
  * rejection (the decode path must degrade to error rows, never throw).
  */
class MultimodalSpec extends AnyFunSuite {

  private def pgm(w: Int, h: Int, px: Array[Byte]): Array[Byte] =
    s"P5\n$w $h\n255\n".getBytes("US-ASCII") ++ px

  test("parse roundtrip: header + pixels recovered exactly") {
    val px = Array.tabulate(6 * 2)(i => (i * 17 % 256).toByte)
    val Some((w, h, got)) = Multimodal.parsePgm(pgm(6, 2, px))
    assert(w === 6 && h === 2)
    assert(got.toSeq === px.toSeq)
  }

  test("malformed payloads are rejected, not fatal") {
    val px = Array.fill(4)(7.toByte)
    assert(Multimodal.parsePgm(Array.empty[Byte]).isEmpty)
    assert(Multimodal.parsePgm("P6\n2 2\n255\n".getBytes ++ px).isEmpty) // wrong magic
    assert(Multimodal.parsePgm("P5\n2 2\n254\n".getBytes ++ px).isEmpty) // wrong maxval
    assert(Multimodal.parsePgm("P5\n2 2\n255\n".getBytes ++ px.take(3)).isEmpty) // truncated
    assert(Multimodal.parsePgm("P5\n2 2\n255\n".getBytes ++ px ++ Array(1.toByte)).isEmpty) // trailing
    assert(Multimodal.parsePgm("P5\n0 2\n255\n".getBytes).isEmpty) // zero dim
    assert(Multimodal.parsePgm("P5\nx 2\n255\n".getBytes ++ px).isEmpty) // non-numeric
    // Int-overflow dims: 65536×65536 wraps to 0 in Int — must not match an
    // empty pixel plane
    assert(Multimodal.parsePgm("P5\n65536 65536\n255\n".getBytes).isEmpty)
    // corrupted separator after maxval (0xFF where whitespace is mandatory)
    assert(Multimodal.parsePgm("P5\n2 2\n255".getBytes ++ Array(0xff.toByte) ++ px).isEmpty)
  }

  test("multi-digit dims and whitespace variants parse") {
    val px = Array.fill(120 * 3)(42.toByte)
    val Some((w, h, _)) = Multimodal.parsePgm(("P5\n120\t3\r\n255\n".getBytes("US-ASCII")) ++ px)
    assert(w === 120 && h === 3)
  }
}
