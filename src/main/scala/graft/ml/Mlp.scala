package graft.ml

/** Minimal 2-layer MLP (dense→tanh→dense→{sigmoid|linear}) on flat
  * double-array parameters, used executor-side by the GAN trainer.
  *
  * Parameters live in one flat array `[W1 | b1 | W2 | b2]` so distributed
  * parameter averaging (the reference's ParameterAveragingTrainingMaster
  * semantics, dl4jGANComputerVision.java:325-330) is a single vector sum.
  * Gradients are elementwise-clipped to ±1.0 like the reference
  * (GradientNormalization.ClipElementWiseAbsoluteValue, :123-124).
  */
final class Mlp2(val nIn: Int, val nHidden: Int, val nOut: Int, sigmoidOut: Boolean)
    extends Net {
  val sizeW1: Int = nIn * nHidden
  val sizeW2: Int = nHidden * nOut
  val nParams: Int = sizeW1 + nHidden + sizeW2 + nOut
  private val offB1 = sizeW1
  private val offW2 = sizeW1 + nHidden
  private val offB2 = offW2 + sizeW2

  /** Xavier-ish deterministic init. */
  def init(seed: Long): Array[Double] = {
    val rng = new java.util.Random(seed)
    val p = new Array[Double](nParams)
    val s1 = math.sqrt(2.0 / (nIn + nHidden))
    val s2 = math.sqrt(2.0 / (nHidden + nOut))
    var i = 0
    while (i < sizeW1) { p(i) = rng.nextGaussian() * s1; i += 1 }
    i = offW2
    while (i < offW2 + sizeW2) { p(i) = rng.nextGaussian() * s2; i += 1 }
    p
  }

  /** Forward pass; returns (hidden, out). */
  def forward(p: Array[Double], x: Array[Double]): (Array[Double], Array[Double]) = {
    val h = new Array[Double](nHidden)
    var j = 0
    while (j < nHidden) {
      var a = p(offB1 + j)
      var i = 0
      while (i < nIn) { a += x(i) * p(i * nHidden + j); i += 1 }
      h(j) = math.tanh(a)
      j += 1
    }
    val o = new Array[Double](nOut)
    var k = 0
    while (k < nOut) {
      var a = p(offB2 + k)
      j = 0
      while (j < nHidden) { a += h(j) * p(offW2 + j * nOut + k); j += 1 }
      o(k) = if (sigmoidOut) 1.0 / (1.0 + math.exp(-a)) else a
      k += 1
    }
    (h, o)
  }

  /** SGD step on (x, dOut) where dOut = ∂L/∂preactivation of the output
    * layer (for sigmoid+BCE that is `pred − target`). Returns ∂L/∂x for
    * chaining into an upstream network (generator-through-discriminator).
    * Updates `p` in place when `update`, always computes the input grad.
    */
  def backward(p: Array[Double], x: Array[Double], h: Array[Double],
      dOut: Array[Double], lr: Double, update: Boolean): Array[Double] = {
    // hidden grad: dh = W2·dOut ∘ (1 − h²)
    val dh = new Array[Double](nHidden)
    var j = 0
    while (j < nHidden) {
      var a = 0.0
      var k = 0
      while (k < nOut) { a += p(offW2 + j * nOut + k) * dOut(k); k += 1 }
      dh(j) = a * (1.0 - h(j) * h(j))
      j += 1
    }
    // input grad (before any update)
    val dx = new Array[Double](nIn)
    var i = 0
    while (i < nIn) {
      var a = 0.0
      j = 0
      while (j < nHidden) { a += p(i * nHidden + j) * dh(j); j += 1 }
      dx(i) = a
      i += 1
    }
    if (update) {
      var k = 0
      while (k < nOut) {
        p(offB2 + k) -= lr * clip(dOut(k))
        j = 0
        while (j < nHidden) { p(offW2 + j * nOut + k) -= lr * clip(h(j) * dOut(k)); j += 1 }
        k += 1
      }
      j = 0
      while (j < nHidden) {
        p(offB1 + j) -= lr * clip(dh(j))
        i = 0
        while (i < nIn) { p(i * nHidden + j) -= lr * clip(x(i) * dh(j)); i += 1 }
        j += 1
      }
    }
    dx
  }

  // Net adapters: the cache is the hidden activation array.
  def fwd(p: Array[Double], x: Array[Double]): (AnyRef, Array[Double]) = {
    val (h, o) = forward(p, x)
    (h, o)
  }
  def bwd(p: Array[Double], x: Array[Double], cache: AnyRef,
      dPreOut: Array[Double], lr: Double, update: Boolean): Array[Double] =
    backward(p, x, cache.asInstanceOf[Array[Double]], dPreOut, lr, update)
  def features(p: Array[Double], x: Array[Double]): Array[Double] = forward(p, x)._1
}
