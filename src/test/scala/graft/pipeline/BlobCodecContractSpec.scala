package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Multimodal.BlobCodec

/** The reusable [[Multimodal.BlobCodec]] conformance kit (r13 verdict
  * #4): one parameterized battery — determinism per input, dim
  * contract, finiteness, thread-safety under concurrent calls on the
  * shared instance, optional resize byte-count law — instantiated
  * against every shipped/test codec. A production implementer runs the
  * same battery against their real decoder by calling
  * `Multimodal.validateCodec(myCodec, probes = myRealPayloads, ...)`
  * in their own suite; the negative cases below prove the kit actually
  * catches each violation class rather than vacuously passing.
  */
class BlobCodecContractSpec extends AnyFunSuite {

  /** The parameterized battery: registers the full conformance run for
    * one codec instance. `resizeByteLaw` is the codec's documented
    * output-size law, if it has one.
    */
  def codecContract(name: String, codec: BlobCodec,
      resizeByteLaw: Option[(Int, Int, Int) => Int]): Unit =
    test(s"$name satisfies the BlobCodec contract") {
      val violations = Multimodal.validateCodec(codec,
        resizeByteLaw = resizeByteLaw)
      assert(violations.isEmpty,
        s"$name violates the codec contract:\n  " +
          violations.mkString("\n  "))
    }

  // ---- conformant instances ------------------------------------------

  codecContract("StubCodec (the shipped offline stand-in)",
    Multimodal.StubCodec,
    resizeByteLaw = Some((len, w, h) => math.min(len, w * h)))

  /** The PipelineSpec seam-test fake — visibly different outputs from
    * the stub, but contract-conformant; documents that ANY conformant
    * codec drops into the battery unchanged.
    */
  object SeamFake extends BlobCodec {
    def features(content: Array[Byte], dim: Int): Array[Float] =
      Array.fill(dim)(content.length.toFloat)
    def resize(content: Array[Byte], w: Int, h: Int): Array[Byte] =
      content.reverse.take(w)
  }
  codecContract("seam-test fake codec", SeamFake,
    resizeByteLaw = Some((len, w, _) => math.min(len, w)))

  // ---- the kit must CATCH violations (not vacuously pass) ------------

  test("kit flags a wrong-dim codec") {
    val bad = new BlobCodec {
      def features(c: Array[Byte], dim: Int): Array[Float] =
        new Array[Float](dim + 1)
      def resize(c: Array[Byte], w: Int, h: Int): Array[Byte] = c
    }
    assert(Multimodal.validateCodec(bad).exists(_.startsWith("dim contract")))
  }

  test("kit flags NaN features") {
    val bad = new BlobCodec {
      def features(c: Array[Byte], dim: Int): Array[Float] =
        Array.fill(dim)(Float.NaN)
      def resize(c: Array[Byte], w: Int, h: Int): Array[Byte] = c
    }
    assert(Multimodal.validateCodec(bad).exists(_.startsWith("finiteness")))
  }

  test("kit flags a nondeterministic codec") {
    val bad = new BlobCodec {
      private val n = new java.util.concurrent.atomic.AtomicLong()
      def features(c: Array[Byte], dim: Int): Array[Float] =
        Array.fill(dim)(n.incrementAndGet().toFloat)
      def resize(c: Array[Byte], w: Int, h: Int): Array[Byte] = c
    }
    assert(Multimodal.validateCodec(bad).exists(_.startsWith("determinism")))
  }

  test("kit flags a thread-UNSAFE codec (shared mutable context)") {
    // The violation the scaladoc warns about: a per-INSTANCE decode
    // buffer. Single-threaded it is deterministic (passes laws 1-3);
    // under concurrent tasks the shared buffer interleaves.
    val bad = new BlobCodec {
      private val buf = new Array[Float](64) // shared instance state
      def features(c: Array[Byte], dim: Int): Array[Float] = {
        var i = 0
        while (i < dim) {
          buf(i) = (c.length + i).toFloat
          // widen the interleave window so the race is reliably seen
          if (c.length > 4096) Thread.`yield`()
          i += 1
        }
        java.util.Arrays.copyOf(buf, dim).map(_ + c.length % 2)
      }
      def resize(c: Array[Byte], w: Int, h: Int): Array[Byte] = c
    }
    // deterministic single-threaded ⇒ only the concurrency law can
    // catch it. The interleave is probabilistic, so hammer up to a few
    // rounds — one detection proves the kit catches the class.
    val caught = (1 to 10).exists { _ =>
      Multimodal.validateCodec(bad, threads = 16)
        .exists(_.startsWith("thread-safety"))
    }
    assert(caught, "kit never observed the shared-buffer race in 10 rounds")
  }

  test("kit flags a byte-count-law violation") {
    val bad = new BlobCodec {
      def features(c: Array[Byte], dim: Int): Array[Float] =
        new Array[Float](dim)
      def resize(c: Array[Byte], w: Int, h: Int): Array[Byte] =
        new Array[Byte](w * h + 7)
    }
    val v = Multimodal.validateCodec(bad,
      resizeByteLaw = Some((len, w, h) => math.min(len, w * h)))
    assert(v.exists(_.startsWith("byte-count law")))
  }
}
