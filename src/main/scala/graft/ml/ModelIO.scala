package graft.ml

import java.io.{BufferedInputStream, BufferedOutputStream, ObjectInputStream, ObjectOutputStream}
import java.nio.file.{Files, Paths}

/** Model persistence — the reference's ModelSerializer surface
  * (dl4jGANComputerVision.java:605-619 writes dis/gan/gen/CV models each
  * loop). Models are O(params) driver-side objects; (de)serialization
  * never touches the cluster.
  */
object ModelIO {

  def save(model: Gan.Model, path: String): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    val out = new ObjectOutputStream(new BufferedOutputStream(Files.newOutputStream(p)))
    try {
      out.writeObject(model.cfg)
      out.writeObject(model.dParams)
      out.writeObject(model.gParams)
    } finally out.close()
  }

  def load(path: String): Gan.Model = {
    val in = new ObjectInputStream(new BufferedInputStream(Files.newInputStream(Paths.get(path))))
    try {
      val cfg = in.readObject().asInstanceOf[Gan.Config]
      val d = in.readObject().asInstanceOf[Array[Double]]
      val g = in.readObject().asInstanceOf[Array[Double]]
      Gan.Model(cfg, d, g)
    } finally in.close()
  }
}
