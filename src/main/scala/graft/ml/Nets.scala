package graft.ml

/** Network family abstraction for the parameter-averaged GAN trainer.
  *
  * Parameters are ONE flat double array per net, so the distributed
  * parameter average (the reference's ParameterAveragingTrainingMaster,
  * dl4jGANComputerVision.java:325-330) stays a single vector sum whatever
  * the architecture. `fwd` returns an opaque activation cache that `bwd`
  * consumes; `dPreOut` is ∂L/∂(output preactivation) — for sigmoid+BCE
  * that is `pred − target`.
  */
trait Net extends Serializable {
  def nIn: Int
  def nOut: Int
  def nParams: Int
  def init(seed: Long): Array[Double]
  def fwd(p: Array[Double], x: Array[Double]): (AnyRef, Array[Double])
  def bwd(p: Array[Double], x: Array[Double], cache: AnyRef,
      dPreOut: Array[Double], lr: Double, update: Boolean): Array[Double]
  /** Penultimate representation — the transfer-learning feature vector. */
  def features(p: Array[Double], x: Array[Double]): Array[Double]

  @inline protected final def clip(g: Double): Double =
    if (g > 1.0) 1.0 else if (g < -1.0) -1.0 else g
}

/** Convolutional discriminator on 8×8 single-channel inputs — the
  * reference's CNN discriminator (conv5x5/s2 → maxpool → conv → maxpool →
  * dense → sigmoid, dl4jGANComputerVision.java:118-165) scaled to the
  * 64-d (8×8) embedding grid: conv3x3(4) tanh → conv3x3(8) tanh →
  * maxpool2 → dense(32→1) sigmoid. Features = the 32-d pooled map.
  */
final class ConvDis extends Net {
  val nIn = 64
  val nOut = 1
  private val C1 = 4 // conv1 filters, 8x8 -> 6x6x4
  private val C2 = 8 // conv2 filters, 6x6x4 -> 4x4x8; pool -> 2x2x8 = 32
  private val offB1 = C1 * 9          // 36
  private val offW2 = offB1 + C1      // 40
  private val offB2 = offW2 + C2 * C1 * 9 // 328
  private val offW3 = offB2 + C2      // 336
  private val offB3 = offW3 + 32      // 368
  val nParams: Int = offB3 + 1        // 369

  def init(seed: Long): Array[Double] = {
    val rng = new java.util.Random(seed)
    val p = new Array[Double](nParams)
    val s1 = math.sqrt(2.0 / (9 + 9 * C1))
    val s2 = math.sqrt(2.0 / (9 * C1 + 9 * C2))
    val s3 = math.sqrt(2.0 / (32 + 1))
    var i = 0
    while (i < offB1) { p(i) = rng.nextGaussian() * s1; i += 1 }
    i = offW2
    while (i < offB2) { p(i) = rng.nextGaussian() * s2; i += 1 }
    i = offW3
    while (i < offB3) { p(i) = rng.nextGaussian() * s3; i += 1 }
    p
  }

  def fwd(p: Array[Double], x: Array[Double]): (AnyRef, Array[Double]) = {
    // conv1 (valid): 8x8 -> 6x6xC1, tanh
    val a1 = new Array[Double](6 * 6 * C1)
    var f = 0
    while (f < C1) {
      var y = 0
      while (y < 6) {
        var xx = 0
        while (xx < 6) {
          var a = p(offB1 + f)
          var ky = 0
          while (ky < 3) {
            var kx = 0
            while (kx < 3) {
              a += x((y + ky) * 8 + (xx + kx)) * p(f * 9 + ky * 3 + kx)
              kx += 1
            }
            ky += 1
          }
          a1((f * 6 + y) * 6 + xx) = math.tanh(a)
          xx += 1
        }
        y += 1
      }
      f += 1
    }
    // conv2 (valid): 6x6xC1 -> 4x4xC2, tanh
    val a2 = new Array[Double](4 * 4 * C2)
    f = 0
    while (f < C2) {
      var y = 0
      while (y < 4) {
        var xx = 0
        while (xx < 4) {
          var a = p(offB2 + f)
          var c = 0
          while (c < C1) {
            var ky = 0
            while (ky < 3) {
              var kx = 0
              while (kx < 3) {
                a += a1((c * 6 + y + ky) * 6 + (xx + kx)) *
                  p(offW2 + ((f * C1 + c) * 3 + ky) * 3 + kx)
                kx += 1
              }
              ky += 1
            }
            c += 1
          }
          a2((f * 4 + y) * 4 + xx) = math.tanh(a)
          xx += 1
        }
        y += 1
      }
      f += 1
    }
    // maxpool 2x2 -> 2x2xC2 (track argmax)
    val pool = new Array[Double](32)
    val poolIdx = new Array[Int](32)
    f = 0
    while (f < C2) {
      var y = 0
      while (y < 2) {
        var xx = 0
        while (xx < 2) {
          var best = Double.NegativeInfinity
          var bestI = -1
          var dy = 0
          while (dy < 2) {
            var dx = 0
            while (dx < 2) {
              val idx = (f * 4 + 2 * y + dy) * 4 + (2 * xx + dx)
              if (a2(idx) > best) { best = a2(idx); bestI = idx }
              dx += 1
            }
            dy += 1
          }
          pool((f * 2 + y) * 2 + xx) = best
          poolIdx((f * 2 + y) * 2 + xx) = bestI
          xx += 1
        }
        y += 1
      }
      f += 1
    }
    // dense 32 -> 1, sigmoid
    var o = p(offB3)
    var i = 0
    while (i < 32) { o += pool(i) * p(offW3 + i); i += 1 }
    val out = Array(1.0 / (1.0 + math.exp(-o)))
    ((a1, a2, pool, poolIdx), out)
  }

  def bwd(p: Array[Double], x: Array[Double], cache: AnyRef,
      dPreOut: Array[Double], lr: Double, update: Boolean): Array[Double] = {
    val (a1, a2, pool, poolIdx) =
      cache.asInstanceOf[(Array[Double], Array[Double], Array[Double], Array[Int])]
    val dOut = dPreOut(0)
    // dense backward
    val dPool = new Array[Double](32)
    var i = 0
    while (i < 32) { dPool(i) = p(offW3 + i) * dOut; i += 1 }
    // unpool (scatter to argmax) + tanh'
    val dPre2 = new Array[Double](4 * 4 * C2)
    i = 0
    while (i < 32) {
      val idx = poolIdx(i)
      dPre2(idx) += dPool(i) * (1.0 - a2(idx) * a2(idx))
      i += 1
    }
    // conv2 backward -> da1
    val dA1 = new Array[Double](6 * 6 * C1)
    var f = 0
    while (f < C2) {
      var y = 0
      while (y < 4) {
        var xx = 0
        while (xx < 4) {
          val g = dPre2((f * 4 + y) * 4 + xx)
          if (g != 0.0) {
            var c = 0
            while (c < C1) {
              var ky = 0
              while (ky < 3) {
                var kx = 0
                while (kx < 3) {
                  dA1((c * 6 + y + ky) * 6 + (xx + kx)) +=
                    p(offW2 + ((f * C1 + c) * 3 + ky) * 3 + kx) * g
                  kx += 1
                }
                ky += 1
              }
              c += 1
            }
          }
          xx += 1
        }
        y += 1
      }
      f += 1
    }
    // tanh' through a1
    val dPre1 = new Array[Double](6 * 6 * C1)
    i = 0
    while (i < dPre1.length) { dPre1(i) = dA1(i) * (1.0 - a1(i) * a1(i)); i += 1 }
    // dx (before updates)
    val dx = new Array[Double](64)
    f = 0
    while (f < C1) {
      var y = 0
      while (y < 6) {
        var xx = 0
        while (xx < 6) {
          val g = dPre1((f * 6 + y) * 6 + xx)
          if (g != 0.0) {
            var ky = 0
            while (ky < 3) {
              var kx = 0
              while (kx < 3) {
                dx((y + ky) * 8 + (xx + kx)) += p(f * 9 + ky * 3 + kx) * g
                kx += 1
              }
              ky += 1
            }
          }
          xx += 1
        }
        y += 1
      }
      f += 1
    }
    if (update) {
      // dense
      i = 0
      while (i < 32) { p(offW3 + i) -= lr * clip(pool(i) * dOut); i += 1 }
      p(offB3) -= lr * clip(dOut)
      // conv2
      f = 0
      while (f < C2) {
        var db = 0.0
        var y = 0
        while (y < 4) {
          var xx = 0
          while (xx < 4) {
            val g = dPre2((f * 4 + y) * 4 + xx)
            if (g != 0.0) {
              db += g
              var c = 0
              while (c < C1) {
                var ky = 0
                while (ky < 3) {
                  var kx = 0
                  while (kx < 3) {
                    p(offW2 + ((f * C1 + c) * 3 + ky) * 3 + kx) -=
                      lr * clip(a1((c * 6 + y + ky) * 6 + (xx + kx)) * g)
                    kx += 1
                  }
                  ky += 1
                }
                c += 1
              }
            }
            xx += 1
          }
          y += 1
        }
        p(offB2 + f) -= lr * clip(db)
        f += 1
      }
      // conv1
      f = 0
      while (f < C1) {
        var db = 0.0
        var y = 0
        while (y < 6) {
          var xx = 0
          while (xx < 6) {
            val g = dPre1((f * 6 + y) * 6 + xx)
            if (g != 0.0) {
              db += g
              var ky = 0
              while (ky < 3) {
                var kx = 0
                while (kx < 3) {
                  p(f * 9 + ky * 3 + kx) -= lr * clip(x((y + ky) * 8 + (xx + kx)) * g)
                  kx += 1
                }
                ky += 1
              }
            }
            xx += 1
          }
          y += 1
        }
        p(offB1 + f) -= lr * clip(db)
        f += 1
      }
    }
    dx
  }

  def features(p: Array[Double], x: Array[Double]): Array[Double] =
    fwd(p, x)._1.asInstanceOf[(Array[Double], Array[Double], Array[Double], Array[Int])]._3
}

/** Convolutional generator — the reference's upsampling generator
  * (dense → reshape → upsample → conv → … → sigmoid,
  * dl4jGANComputerVision.java:173-221) at 8×8 scale: z → dense(4·4·4)
  * tanh → nearest-upsample 2× → conv3x3(pad 1) → sigmoid 8×8.
  */
final class ConvGen(val zDim: Int) extends Net {
  val nIn: Int = zDim
  val nOut = 64
  private val C = 4 // channels in the 4x4 seed map
  private val offB1 = zDim * 64       // dense W
  private val offW2 = offB1 + 64      // conv W (1 filter, 3x3xC)
  private val offB2 = offW2 + C * 9
  val nParams: Int = offB2 + 1

  def init(seed: Long): Array[Double] = {
    val rng = new java.util.Random(seed)
    val p = new Array[Double](nParams)
    val s1 = math.sqrt(2.0 / (zDim + 64))
    val s2 = math.sqrt(2.0 / (9 * C + 1))
    var i = 0
    while (i < offB1) { p(i) = rng.nextGaussian() * s1; i += 1 }
    i = offW2
    while (i < offB2) { p(i) = rng.nextGaussian() * s2; i += 1 }
    p
  }

  def fwd(p: Array[Double], z: Array[Double]): (AnyRef, Array[Double]) = {
    // dense z -> 4x4xC, tanh
    val h = new Array[Double](64)
    var j = 0
    while (j < 64) {
      var a = p(offB1 + j)
      var i = 0
      while (i < zDim) { a += z(i) * p(i * 64 + j); i += 1 }
      h(j) = math.tanh(a)
      j += 1
    }
    // nearest upsample 2x: (c,4,4) -> (c,8,8)
    val u = new Array[Double](C * 64)
    var c = 0
    while (c < C) {
      var y = 0
      while (y < 8) {
        var xx = 0
        while (xx < 8) {
          u((c * 8 + y) * 8 + xx) = h((c * 4 + y / 2) * 4 + xx / 2)
          xx += 1
        }
        y += 1
      }
      c += 1
    }
    // conv 3x3 pad 1 (1 filter over C channels) + sigmoid -> 8x8
    val out = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var xx = 0
      while (xx < 8) {
        var a = p(offB2)
        c = 0
        while (c < C) {
          var ky = 0
          while (ky < 3) {
            val sy = y + ky - 1
            if (sy >= 0 && sy < 8) {
              var kx = 0
              while (kx < 3) {
                val sx = xx + kx - 1
                if (sx >= 0 && sx < 8) {
                  a += u((c * 8 + sy) * 8 + sx) * p(offW2 + (c * 3 + ky) * 3 + kx)
                }
                kx += 1
              }
            }
            ky += 1
          }
          c += 1
        }
        out(y * 8 + xx) = 1.0 / (1.0 + math.exp(-a))
        xx += 1
      }
      y += 1
    }
    ((h, u), out)
  }

  def bwd(p: Array[Double], z: Array[Double], cache: AnyRef,
      dPreOut: Array[Double], lr: Double, update: Boolean): Array[Double] = {
    val (h, u) = cache.asInstanceOf[(Array[Double], Array[Double])]
    // conv backward: du + weight grads
    val dU = new Array[Double](C * 64)
    var dB2 = 0.0
    val dW2 = new Array[Double](C * 9)
    var y = 0
    while (y < 8) {
      var xx = 0
      while (xx < 8) {
        val g = dPreOut(y * 8 + xx)
        if (g != 0.0) {
          dB2 += g
          var c = 0
          while (c < C) {
            var ky = 0
            while (ky < 3) {
              val sy = y + ky - 1
              if (sy >= 0 && sy < 8) {
                var kx = 0
                while (kx < 3) {
                  val sx = xx + kx - 1
                  if (sx >= 0 && sx < 8) {
                    dU((c * 8 + sy) * 8 + sx) += p(offW2 + (c * 3 + ky) * 3 + kx) * g
                    dW2((c * 3 + ky) * 3 + kx) += u((c * 8 + sy) * 8 + sx) * g
                  }
                  kx += 1
                }
              }
              ky += 1
            }
            c += 1
          }
        }
        xx += 1
      }
      y += 1
    }
    // upsample backward (sum the 2x2 cell grads) + tanh'
    val dPre1 = new Array[Double](64)
    var c = 0
    while (c < C) {
      y = 0
      while (y < 8) {
        var xx = 0
        while (xx < 8) {
          dPre1((c * 4 + y / 2) * 4 + xx / 2) += dU((c * 8 + y) * 8 + xx)
          xx += 1
        }
        y += 1
      }
      c += 1
    }
    var j = 0
    while (j < 64) { dPre1(j) *= (1.0 - h(j) * h(j)); j += 1 }
    // dz
    val dz = new Array[Double](zDim)
    var i = 0
    while (i < zDim) {
      var a = 0.0
      j = 0
      while (j < 64) { a += p(i * 64 + j) * dPre1(j); j += 1 }
      dz(i) = a
      i += 1
    }
    if (update) {
      i = 0
      while (i < C * 9) { p(offW2 + i) -= lr * clip(dW2(i)); i += 1 }
      p(offB2) -= lr * clip(dB2)
      j = 0
      while (j < 64) {
        p(offB1 + j) -= lr * clip(dPre1(j))
        i = 0
        while (i < zDim) { p(i * 64 + j) -= lr * clip(z(i) * dPre1(j)); i += 1 }
        j += 1
      }
    }
    dz
  }

  def features(p: Array[Double], z: Array[Double]): Array[Double] =
    fwd(p, z)._1.asInstanceOf[(Array[Double], Array[Double])]._1
}
