package graft

import graft.model.Geometry
import org.scalatest.funsuite.AnyFunSuite

/** Ports the reference's geometry test vectors verbatim
  * (tests/test_geometry.py:4-17).
  */
class GeometrySpec extends AnyFunSuite {
  test("sim_bbox reference vectors: 0.5 / 1 / 0") {
    assert(Geometry.simBbox(
      Seq((0.0, 0.0), (1.0, 1.0), (1.0, 1.0), (0.0, 1.0)),
      Seq((0.0, 0.0), (1.0, 0.5), (1.0, 0.0), (0.0, 0.5))) == 0.5)
    assert(Geometry.simBbox(
      Seq((0.0, 0.0), (1.0, 1.0), (1.0, 1.0), (0.0, 1.0)),
      Seq((0.0, 0.0), (1.0, 1.0), (1.0, 0.0), (0.0, 1.0))) == 1.0)
    assert(Geometry.simBbox(
      Seq((0.0, 0.0), (1.0, 1.0), (1.0, 1.0), (0.0, 1.0)),
      Seq((5.0, 5.0), (1.0, 1.0), (1.0, 5.0), (5.0, 1.0))) == 0.0)
  }

  test("bbox requires >= 4 points (geometry.py:8)") {
    intercept[IllegalArgumentException] {
      Geometry.boundsOf(Seq((0.0, 0.0), (1.0, 1.0)))
    }
  }
}
