package graft

import graft.sources.TopoGolden

/** Pins the live countries-topology export to the FROZEN
  * sources.TopoGolden literals that back the q_topo_objects /
  * q_topo_slices DuckDB oracles. If the engine's arcs/uses drift, this
  * fails loudly — the oracle keeps replaying the reviewed frozen artifact
  * rather than silently re-deriving from drifted engine output (refreeze
  * intentionally via tools.DumpTopoExport, documenting why).
  */
class TopoGoldenSpec extends SparkTestBase {

  test("live topoCountries arcs/uses export equals the frozen TopoGolden fixture") {
    val (arcs, uses) = SparkEntry.liveTopoExport(spark)
    assert(arcs == TopoGolden.arcs,
      s"arcs export drifted from TopoGolden:\n live=$arcs\n frozen=${TopoGolden.arcs}")
    assert(uses == TopoGolden.uses,
      s"uses export drifted from TopoGolden:\n live=$uses\n frozen=${TopoGolden.uses}")
  }
}
