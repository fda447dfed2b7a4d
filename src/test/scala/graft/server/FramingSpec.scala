package graft.server

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.scalatest.funsuite.AnyFunSuite
import org.xerial.snappy.{SnappyFramedInputStream, SnappyFramedOutputStream}

/** Framing × transport interplay, without sockets: the length-prefixed
  * frames must survive the snappy framing format's own 64 KiB chunking —
  * a single RPC frame (up to 64 MiB) spans many snappy chunks, and the
  * reader must reassemble it exactly across chunk boundaries.
  */
class FramingSpec extends AnyFunSuite {

  test("multi-chunk frames round-trip through snappy framed streams") {
    val rnd = new scala.util.Random(11)
    // ~300 KiB of hard-to-compress text (spans >4 snappy chunks), then a
    // tiny frame, then a highly-compressible one — order and sizes differ
    // so any reader misalignment shows up as a corrupted length prefix
    val big = new String(Array.fill(300 * 1024)((32 + rnd.nextInt(94)).toChar))
    val tiny = "OK"
    val repetitive = "POINTS\n" + ("{\"ts\": 1}\n" * 5000)

    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(new SnappyFramedOutputStream(bos))
    Seq(big, tiny, repetitive).foreach(Framing.write(out, _))
    out.flush()

    val in = new DataInputStream(
      new SnappyFramedInputStream(new ByteArrayInputStream(bos.toByteArray)))
    assert(Framing.read(in).contains(big))
    assert(Framing.read(in).contains(tiny))
    assert(Framing.read(in).contains(repetitive))
    assert(Framing.read(in).isEmpty) // orderly EOF
    // and compression actually engaged on the compressible frame
    assert(bos.size() < big.length + tiny.length + repetitive.length)
  }

  test("plain framing rejects oversized or negative lengths instead of allocating") {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(Framing.MaxFrame + 1)
    val in1 = new DataInputStream(new ByteArrayInputStream(bos.toByteArray))
    intercept[IllegalArgumentException](Framing.read(in1))
    val bos2 = new ByteArrayOutputStream()
    new DataOutputStream(bos2).writeInt(-5)
    val in2 = new DataInputStream(new ByteArrayInputStream(bos2.toByteArray))
    intercept[IllegalArgumentException](Framing.read(in2))
  }
}
