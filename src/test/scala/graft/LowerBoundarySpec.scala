package graft

import org.scalatest.funsuite.AnyFunSuite

/** Canary for the Java-vs-DuckDB lowercasing boundary guard (r12
  * verdict #6): the XXH64 mirror's `lower()`-tokenizing oracles rely
  * on both engines lowercasing identically, which holds for
  * pre-lowercased text and for simple-mapping uppercase, but NOT for
  * contextual mappings (Turkish `İ`, Greek word-final `Σ`). The guard
  * must refuse those loudly at fixture-build time. */
class LowerBoundarySpec extends AnyFunSuite {

  test("pre-lowercased multi-byte fixtures pass the guard") {
    // the actual p63-p65 pools: 2-, 3- and 4-byte UTF-8, lowercase
    Seq("héllo wörld naïve café 日本語 тест мир 🚀 ",
      "δοκιμή αβγ", "überprüfung ß", "проверка текста", "テスト 完了",
      "🎯 emoji 🚀",
      // simple-mapping uppercase also lowers identically on both sides
      "HELLO WÖRLD", "ПРОВЕРКА", "ΑΒΓΔ μέση").foreach(
      DuckOracleSql.assertLowerMirrorSafe("canary", _))
  }

  test("mixed-case Turkish İ refuses loudly") {
    val e = intercept[IllegalArgumentException] {
      DuckOracleSql.assertLowerMirrorSafe("canary", "İstanbul deneme")
    }
    assert(e.getMessage.contains("lowercasing boundary") &&
      e.getMessage.contains("canary"), e.getMessage)
  }

  test("Greek word-final Σ refuses loudly") {
    val e = intercept[IllegalArgumentException] {
      // word-final capital sigma: contextual lower gives ς, simple σ
      DuckOracleSql.assertLowerMirrorSafe("canary", "ΟΔΟΣ πάλι")
    }
    assert(e.getMessage.contains("lowercasing boundary"), e.getMessage)
  }
}
