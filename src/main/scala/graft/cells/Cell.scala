package graft.cells

/** Hierarchical spatial cell index: a quadtree over equirectangular
  * lon/lat ([-180,180] × [-90,90]) with **Hilbert-curve ordering**,
  * encoded S2-style in a 64-bit id so that cell containment is a range
  * test (rangeMin ≤ leaf ≤ rangeMax) and range-partitioning on cell ids
  * gives spatial locality.
  *
  * Encoding (S2-style, cf. the published S2 cell-id scheme the reference
  * uses via golang/geo — re-implemented from scratch over a flat lon/lat
  * square instead of the sphere-cube):
  *
  *   id = (hilbertPos(level) << (2*(MaxLevel-level)+1)) | (1 << (2*(MaxLevel-level)))
  *
  * i.e. the Hilbert position bits followed by a single sentinel bit; the
  * sentinel (lowest set bit) encodes the level. MaxLevel = 30 → 61 bits,
  * always positive. The Hilbert curve's hierarchical property makes a
  * parent's position bits a prefix of all descendants', so:
  *
  *   rangeMin = id - (lsb - 1),  rangeMax = id + (lsb - 1)
  *
  * exactly covers the descendant leaves — the property the reference's
  * segment-tree stab relies on (lookup.go:147-174) and our PIP joins use.
  */
object Cell {
  val MaxLevel = 30

  // S2's Hilbert state tables: position -> (i,j) quadrant for each of the
  // 4 curve orientations, and the orientation delta per position.
  // ij is encoded as (i << 1) | j.
  private val posToIJ: Array[Array[Int]] = Array(
    Array(0, 1, 3, 2), // canonical
    Array(0, 2, 3, 1), // swap
    Array(3, 2, 0, 1), // invert
    Array(3, 1, 0, 2)  // swap | invert
  )
  private val ijToPos: Array[Array[Int]] = posToIJ.map { tbl =>
    val inv = new Array[Int](4)
    for (p <- 0 until 4) inv(tbl(p)) = p
    inv
  }
  private val posToOrientation = Array(1, 0, 0, 3) // swapMask=1, invertMask=2

  /** Hilbert state-transition rows (orientation, i, j, pos, nextOrientation)
    * — the flat export of posToIJ/posToOrientation that lets the DuckDB
    * oracle replay `hilbertPos` bit-for-bit as a recursive-CTE walk
    * (SparkEntry's q_raster_cells oracle).
    */
  def hilbertStateRows: Seq[(Int, Int, Int, Int, Int)] =
    for (o <- 0 to 3; ij <- 0 to 3) yield {
      val pos = ijToPos(o)(ij)
      (o, ij >> 1, ij & 1, pos, o ^ posToOrientation(pos))
    }

  /** Discrete grid coordinate at MaxLevel for a lon/lat. */
  def xy(lon: Double, lat: Double): (Long, Long) = {
    val n = 1L << MaxLevel
    def clamp(v: Long): Long = math.max(0L, math.min(n - 1, v))
    val x = clamp(math.floor((lon + 180.0) / 360.0 * n).toLong)
    val y = clamp(math.floor((lat + 90.0) / 180.0 * n).toLong)
    (x, y)
  }

  /** Hilbert position of grid coord (x,y) truncated to `level` (2*level bits). */
  def hilbertPos(x: Long, y: Long, level: Int): Long = {
    var h = 0L
    var o = 0
    var k = MaxLevel - 1
    val stop = MaxLevel - level
    while (k >= stop) {
      val i = ((x >> k) & 1L).toInt
      val j = ((y >> k) & 1L).toInt
      val pos = ijToPos(o)((i << 1) | j)
      h = (h << 2) | pos
      o ^= posToOrientation(pos)
      k -= 1
    }
    h
  }

  def fromHilbert(h: Long, level: Int): Long =
    (h << (2 * (MaxLevel - level) + 1)) | (1L << (2 * (MaxLevel - level)))

  /** Cell id containing (lon,lat) at `level`. */
  def cellAt(lon: Double, lat: Double, level: Int): Long = {
    val (x, y) = xy(lon, lat)
    fromHilbert(hilbertPos(x, y, level), level)
  }

  /** Leaf cell id (level 30) — the analogue of s2.CellIDFromLatLng. */
  def leaf(lon: Double, lat: Double): Long = cellAt(lon, lat, MaxLevel)

  @inline def lsb(id: Long): Long = id & -id

  def level(id: Long): Int = MaxLevel - (java.lang.Long.numberOfTrailingZeros(id) >> 1)

  def rangeMin(id: Long): Long = id - (lsb(id) - 1)
  def rangeMax(id: Long): Long = id + (lsb(id) - 1)

  def contains(parent: Long, descendant: Long): Boolean =
    rangeMin(parent) <= descendant && descendant <= rangeMax(parent)

  def parent(id: Long, parentLevel: Int): Long = {
    val h = id >> (2 * (MaxLevel - level(id)) + 1)
    fromHilbert(h >> (2 * (level(id) - parentLevel)), parentLevel)
  }

  def children(id: Long): Array[Long] = {
    val l = level(id)
    require(l < MaxLevel, s"leaf cell has no children: $id")
    val h = id >> (2 * (MaxLevel - l) + 1)
    Array.tabulate(4)(k => fromHilbert((h << 2) | k, l + 1))
  }

  /** All ancestor ids of a leaf (or any cell) from minLevel..its level. */
  def ancestors(id: Long, minLevel: Int, maxLevel: Int): Array[Long] = {
    val l = level(id)
    val hi = math.min(l, maxLevel)
    if (hi < minLevel) Array.empty
    else Array.tabulate(hi - minLevel + 1)(k => parent(id, minLevel + k))
  }

  /** Grid (x, y, level) of a cell — x,y are in cell units at that level. */
  def toXY(id: Long): (Long, Long, Int) = {
    val l = level(id)
    var h = id >> (2 * (MaxLevel - l) + 1)
    var x = 0L; var y = 0L
    var o = 0
    var k = 2 * (l - 1)
    while (k >= 0) {
      val pos = ((h >> k) & 3L).toInt
      val ij = posToIJ(o)(pos)
      x = (x << 1) | (ij >> 1)
      y = (y << 1) | (ij & 1)
      o ^= posToOrientation(pos)
      k -= 2
    }
    (x, y, l)
  }

  /** Lon/lat bounds (lonMin, latMin, lonMax, latMax) of a cell. */
  def bounds(id: Long): (Double, Double, Double, Double) = {
    val (x, y, l) = toXY(id)
    val n = (1L << l).toDouble
    (x / n * 360.0 - 180.0, y / n * 180.0 - 90.0,
      (x + 1) / n * 360.0 - 180.0, (y + 1) / n * 180.0 - 90.0)
  }

  /** The 4 corner vertices (lon,lat) of a cell — used by the coverer's
    * vertex-approximate predicates (mirrors lookup/region.go:13-43 which
    * tests cell vertices only).
    */
  def vertices(id: Long): Array[(Double, Double)] = {
    val (lonMin, latMin, lonMax, latMax) = bounds(id)
    Array((lonMin, latMin), (lonMax, latMin), (lonMax, latMax), (lonMin, latMax))
  }

  /** Cell ids in the square ring at Chebyshev distance `r` around the cell
    * (r=0 is the cell itself) — the expanding-ring kNN search frontier.
    * Clipped at the world edge (no wraparound).
    */
  def ring(id: Long, r: Int): Array[Long] = {
    val (x, y, l) = toXY(id)
    val n = 1L << l
    def inGrid(a: Long, b: Long) = a >= 0 && a < n && b >= 0 && b < n
    def mk(a: Long, b: Long): Long = fromHilbert(hilbertPos(a << (MaxLevel - l), b << (MaxLevel - l), l), l)
    if (r == 0) return Array(id)
    val out = collection.mutable.ArrayBuffer[Long]()
    var i = -r.toLong
    while (i <= r) {
      // top and bottom rows
      if (inGrid(x + i, y - r)) out += mk(x + i, y - r)
      if (inGrid(x + i, y + r)) out += mk(x + i, y + r)
      // left and right columns (excluding corners already added)
      if (math.abs(i) != r) {
        if (inGrid(x - r, y + i)) out += mk(x - r, y + i)
        if (inGrid(x + r, y + i)) out += mk(x + r, y + i)
      }
      i += 1
    }
    out.toArray
  }

  /** Quadkey string (Bing-style, z characters of 0-3) for a cell id —
    * derived from the plain (non-Hilbert) quadtree path so it matches the
    * SQL-expressible tx/ty tiling exactly.
    */
  def quadkey(id: Long): String = {
    val (x, y, l) = toXY(id)
    val sb = new StringBuilder
    var k = l - 1
    while (k >= 0) {
      val d = (((x >> k) & 1L) | (((y >> k) & 1L) << 1)).toInt
      sb.append(('0' + d).toChar)
      k -= 1
    }
    sb.toString
  }
}
