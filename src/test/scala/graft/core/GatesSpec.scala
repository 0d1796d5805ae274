package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.Fixtures
import graft.Fixtures.fequal

class GatesSpec extends AnyFunSuite {

  test("gate features match cnf_gates.txt golden (allclose 1e-5)") {
    val buf = Fixtures.resourceBytes("/gbdc/cnf_test.cnf.xz")
    val values = Gates.extract(buf)
    val golden = Fixtures.goldenRecord("/gbdc/expected_records/cnf_gates.txt")
    val produced = Gates.featureNames.zip(values).toMap
    val missing = golden.keySet -- produced.keySet
    assert(missing.isEmpty, s"missing: $missing")
    for ((k, expected) <- golden) {
      val actual = produced(k)
      assert(fequal(actual, expected), s"$k: engine=$actual golden=$expected")
    }
  }

  test("hand-built AND gate recognized monotonically") {
    // root unit: 3. gate 3 = AND(1, 2): (-3 1)(-3 2)(3 -1 -2)
    val doc = "p cnf 3 4\n3 0\n-3 1 0\n-3 2 0\n3 -1 -2 0\n".getBytes("UTF-8")
    val values = Gates.featureNames.zip(Gates.extract(doc)).toMap
    assert(values("n_gates") == 1.0)
    assert(values("n_mono") == 1.0) // monotonic roots take the MONO path
    assert(values("n_roots") >= 1.0)
  }
}
