package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ml.{ConvDis, ConvGen, Gan, Net}

/** Finite-difference validation of the conv nets' backward passes (the
  * same guard MlpSpec provides for the dense family), plus conv-GAN
  * training invariants.
  */
class ConvNetSpec extends AnyFunSuite {

  /** Numeric ∂L/∂p check for L = Σ dPre·preact-linearization: we check
    * the *update* direction instead — perturb one param, rerun forward,
    * and compare the loss delta against the analytic gradient implied by
    * the parameter update at lr=1 (clipping disabled by small grads).
    */
  private def bceLoss(net: Net, p: Array[Double], x: Array[Double], target: Double): Double = {
    val o = net.fwd(p, x)._2(0)
    -(target * math.log(o + 1e-12) + (1 - target) * math.log(1 - o + 1e-12))
  }

  test("ConvDis backward matches finite differences (BCE loss)") {
    val net = new ConvDis
    val rng = new java.util.Random(7)
    val p = net.init(3L)
    val x = Array.fill(64)(rng.nextDouble())
    val target = 1.0
    // analytic: dPreOut = pred − target; capture grads via update at lr
    val o = net.fwd(p, x)._2(0)
    val lr = 1e-6
    val pUpd = p.clone()
    net.bwd(pUpd, x, net.fwd(pUpd, x)._1, Array(o - target), lr, update = true)
    // analytic grad of param i ≈ (p(i) − pUpd(i)) / lr  (clip inactive for tiny grads? no —
    // clip caps |g| at 1, so compare only where |g| < 1)
    val eps = 1e-5
    val idxs = Seq(0, 17, 37, 41, 300, 330, 340, 368) // spread across W1/b1/W2/b2/W3/b3
    idxs.foreach { i =>
      val g = (p(i) - pUpd(i)) / lr
      val pPlus = p.clone(); pPlus(i) += eps
      val pMinus = p.clone(); pMinus(i) -= eps
      val num = (bceLoss(net, pPlus, x, target) - bceLoss(net, pMinus, x, target)) / (2 * eps)
      if (math.abs(num) < 0.99) { // clip-free region
        assert(math.abs(g - num) < 1e-3,
          s"param $i: analytic $g vs numeric $num")
      }
    }
  }

  test("ConvGen backward matches finite differences (through dis target)") {
    val gen = new ConvGen(8)
    val rng = new java.util.Random(11)
    val g = gen.init(5L)
    val z = Array.fill(8)(rng.nextDouble() * 2 - 1)
    // L = Σ (out − t)²/2 with random target t → dPreOut = (out − t)·σ'
    val t = Array.fill(64)(rng.nextDouble())
    def loss(params: Array[Double]): Double = {
      val o = gen.fwd(params, z)._2
      o.indices.map(i => (o(i) - t(i)) * (o(i) - t(i)) / 2).sum
    }
    val (cache, out) = gen.fwd(g, z)
    val dPre = Array.tabulate(64)(i => (out(i) - t(i)) * out(i) * (1 - out(i)))
    val lr = 1e-6
    val gUpd = g.clone()
    gen.bwd(gUpd, z, cache, dPre, lr, update = true)
    val eps = 1e-5
    val idxs = Seq(0, 63, 200, 511, 520, 576, 600, 612)
    idxs.foreach { i =>
      val grad = (g(i) - gUpd(i)) / lr
      val gPlus = g.clone(); gPlus(i) += eps
      val gMinus = g.clone(); gMinus(i) -= eps
      val num = (loss(gPlus) - loss(gMinus)) / (2 * eps)
      if (math.abs(num) < 0.99) {
        assert(math.abs(grad - num) < 1e-3,
          s"param $i: analytic $grad vs numeric $num")
      }
    }
  }

  test("maxpool argmax routing: only the max position receives gradient") {
    val net = new ConvDis
    val p = net.init(1L)
    val x = Array.fill(64)(0.3)
    val (cache, o) = net.fwd(p, x)
    // dx must be finite and not identically zero
    val dx = net.bwd(p.clone(), x, cache, Array(o(0) - 1.0), 0.01, update = false)
    assert(dx.exists(_ != 0.0))
    assert(dx.forall(v => !v.isNaN && !v.isInfinite))
  }
}
