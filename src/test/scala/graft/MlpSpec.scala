package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ml.Mlp2

class MlpSpec extends AnyFunSuite {

  private def bce(p: Double, y: Double): Double =
    -(y * math.log(p) + (1 - y) * math.log(1 - p))

  test("backward matches finite-difference gradients (sigmoid+BCE)") {
    val net = new Mlp2(5, 4, 1, sigmoidOut = true)
    val p = net.init(42L)
    val rng = new java.util.Random(7)
    val x = Array.fill(5)(rng.nextDouble())
    val y = 1.0
    // analytic step with tiny lr on a copy; compare against numeric grads
    val eps = 1e-6
    val numGrad = p.indices.map { i =>
      val pp = p.clone(); pp(i) += eps
      val pm = p.clone(); pm(i) -= eps
      (bce(net.forward(pp, x)._2(0), y) - bce(net.forward(pm, x)._2(0), y)) / (2 * eps)
    }
    val lr = 1e-4
    val upd = p.clone()
    val (h, o) = net.forward(upd, x)
    net.backward(upd, x, h, Array(o(0) - y), lr, update = true)
    p.indices.foreach { i =>
      val analytic = (p(i) - upd(i)) / lr // clipped grad; |grad|<1 here so unclipped
      assert(math.abs(analytic - numGrad(i)) < 1e-5,
        s"param $i: analytic $analytic vs numeric ${numGrad(i)}")
    }
  }

  test("input gradient chains correctly (for generator-through-dis)") {
    val net = new Mlp2(3, 4, 1, sigmoidOut = true)
    val p = net.init(1L)
    val x = Array(0.2, -0.4, 0.7)
    val y = 0.0
    val eps = 1e-6
    val (h, o) = net.forward(p, x)
    val dx = net.backward(p, x, h, Array(o(0) - y), 0.0, update = false)
    x.indices.foreach { i =>
      val xp = x.clone(); xp(i) += eps
      val xm = x.clone(); xm(i) -= eps
      val num = (bce(net.forward(p, xp)._2(0), y) - bce(net.forward(p, xm)._2(0), y)) / (2 * eps)
      assert(math.abs(dx(i) - num) < 1e-5, s"dx($i): ${dx(i)} vs $num")
    }
  }

  test("deterministic init") {
    val net = new Mlp2(8, 16, 2, sigmoidOut = false)
    assert(net.init(666L).toSeq == net.init(666L).toSeq)
    assert(net.nParams == 8 * 16 + 16 + 16 * 2 + 2)
  }
}
