package graft.sources

/** FROZEN arcs/uses export of the countries topology build
  * (SparkEntry.topoCountries: layer "countries", simplifyDigits=3,
  * quantize=1e6, water-clipped) over the deterministic fixtures — the
  * reviewed in-repo artifact the q_topo_objects / q_topo_slices DuckDB
  * oracles replay their export arithmetic against.
  *
  * Regenerate ONLY intentionally via `runMain graft.tools.DumpTopoExport`
  * and document why in the commit message; graft.TopoGoldenSpec pins the
  * live engine's export to these rows, so unintended drift fails tests
  * loudly instead of silently re-deriving the oracle from drifted output.
  *
  * Shape: arcs = (arcId, nPts, minx, miny, maxx, maxy) sorted by arcId;
  * uses = (objId, arcId) sorted.
  */
object TopoGolden {
  val arcs: Seq[(Long, Long, Double, Double, Double, Double)] = Seq(
    (0L, 9L, 146.2, -38.9, 156.2, -28.9),
    (1L, 12L, -2.65, 43.85, 7.35, 53.85),
    (2L, 9L, -79.0, 35.7, -69.0, 45.7),
    (3L, 11L, 0.1826271143646599, 45.85, 9.35, 55.85),
    (4L, 9L, 134.7, 30.7, 144.7, 40.7),
    (5L, 3L, 0.767767, 49.082233, 1.5, 52.617767),
    (6L, 5L, -0.65, 50.78964455346047, -0.6, 50.91035544653953),
    (7L, 9L, -1.4, 50.45, -0.6, 51.25),
    (8L, 9L, 6.55, 50.05, 8.15, 51.65))
  val uses: Seq[(Long, Long)] = Seq(
    (100L, 3L),
    (100L, 5L),
    (100L, 6L),
    (100L, 8L),
    (101L, 1L),
    (101L, 5L),
    (101L, 7L),
    (102L, 2L),
    (103L, 4L),
    (104L, 0L))
}
