package graft.pipeline

import graft.nn.ArchZoo

/** The 8 reference AE families keyed by their published names
  * (Simulation_Models/{CNC_AE,X_AE,MM_AE,JISAE,JISAE-O1..O3,MOCSS}
  * _model_selection scripts; name mapping AE_results.ipynb cell 18),
  * each as (d1, d2, orthoMultiplier) => Arch for the search drivers. */
object ArchFamilies {

  val byName: Seq[(String, (Int, Int, Double) => ArchZoo.Arch)] = Seq(
    ("CNC_AE", (a: Int, b: Int, _: Double) => ArchZoo.cnc(a, b)),
    ("X_AE", (a: Int, b: Int, _: Double) => ArchZoo.xae(a, b)),
    ("MM_AE", (a: Int, b: Int, _: Double) => ArchZoo.mm(a, b)),
    ("JISAE", (a: Int, b: Int, _: Double) => ArchZoo.jisae(a, b)),
    ("JISAE-O1", (a: Int, b: Int, m: Double) => ArchZoo.jisaeO1(a, b, m)),
    ("JISAE-O2", (a: Int, b: Int, m: Double) => ArchZoo.jisaeO2(a, b, m)),
    ("JISAE-O3", (a: Int, b: Int, m: Double) => ArchZoo.jisaeO3(a, b, m)),
    ("MOCSS", (a: Int, b: Int, m: Double) => ArchZoo.mocss(a, b, m)))

  def apply(name: String): (Int, Int, Double) => ArchZoo.Arch =
    byName.collectFirst { case (n, mk) if n == name => mk }
      .getOrElse(sys.error(s"unknown arch family: $name (have " +
        byName.map(_._1).mkString(",") + ")"))
}
