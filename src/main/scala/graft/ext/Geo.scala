package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-bucketed spatial joins — the "find everything within radius R"
  * primitive of geo enrichment (store catchment, POI tagging, coverage
  * audits) expressed so it never degenerates into an all-pairs join.
  *
  * The classic failure at scale is `a CROSS JOIN b WHERE dist(a,b) < R`:
  * O(|a|·|b|) comparisons. The fix is the textbook grid hash (a degenerate
  * single-level quadtree): snap every point to a square cell of side R.
  * Any pair within R is then either in the same cell or in horizontally /
  * vertically / diagonally adjacent cells, so REPLICATING ONE SIDE to its
  * 3×3 cell neighborhood and equi-joining on the cell id finds every
  * candidate exactly once (the probe side keeps its single home cell, so
  * no candidate can match twice), and the exact distance predicate then
  * keeps only true hits. Comparisons drop from |a|·|b| to
  * Σ_cells |a_cell|·|b_nbhd| — linear for any bounded point density.
  *
  * Coordinates are INTEGER map units and the predicate is the squared
  * Euclidean distance `d² ≤ R²` in pure int64 arithmetic, so threshold
  * membership is bit-exact in any engine — no trig enters until nothing
  * depends on it (a production haversine variant only changes the
  * distance expression and the cell width in degrees; the join geometry
  * is identical). int64 bounds: |Δx|, |Δy| < 4·10⁴ here, d² < 3.2·10⁹ —
  * overflow needs coordinates past 2³¹ map units, unreachable by the
  * domain guard.
  *
  * 100 TB shape: the build side is exploded ×9 and shuffled on the cell
  * id; the probe side shuffles on its home cell. Both are plain hash
  * exchanges on a key whose cardinality grows with the map, so skew only
  * appears where point density does (a dense downtown cell) — the same
  * AQE skew-split / salting levers as any hot join key apply. When the
  * build side is small (a store catalog vs a planet of customers) Spark's
  * size estimate broadcasts the ×9 replica and the probe side never
  * shuffles at all.
  */
object Geo {

  /** All `(probe, build)` pairs with `d² ≤ radius²`, aggregated per probe
    * point: how many build points are in range and which is nearest
    * (min d², ties to the smallest build id — a total order, so the
    * result is unique). Inputs carry `(id, x, y)`; output is one row per
    * probe id with ≥1 in-range build point.
    */
  def radiusJoinNearest(
      probe: DataFrame,
      build: DataFrame,
      radius: Long): DataFrame = {
    require(radius >= 1, s"radius must be >= 1, got $radius")
    val r2 = radius * radius

    def guarded(df: DataFrame, side: String): DataFrame = {
      // loud domain guard: the int64 overflow envelope and the cell-id
      // packing below both assume coordinates in [0, 2^31)
      val lim = 1L << 31
      df.select(
        col("id").cast("long").as(s"${side}_id"),
        when(col("x").cast("long").between(0, lim - 1), col("x").cast("long"))
          .otherwise(expr(s"raise_error('Geo.radiusJoinNearest: $side x out of [0, 2^31)')"))
          .as(s"${side}_x"),
        when(col("y").cast("long").between(0, lim - 1), col("y").cast("long"))
          .otherwise(expr(s"raise_error('Geo.radiusJoinNearest: $side y out of [0, 2^31)')"))
          .as(s"${side}_y"))
    }

    // one packed int64 cell id — (cx, cy) → cx·2³² + cy keeps the join
    // key a single fixed-width long (cheaper to hash/exchange than a
    // struct) and can't collide while cx, cy < 2³²
    def cellId(cx: org.apache.spark.sql.Column, cy: org.apache.spark.sql.Column) =
      cx * (1L << 32) + cy

    // `div`, not `/`: Spark's `/` on longs is double division; integer
    // `div` truncation equals floor here because the guard pins x, y ≥ 0
    val p = guarded(probe, "p")
      .withColumn("cell",
        cellId(expr(s"p_x div ${radius}L"), expr(s"p_y div ${radius}L")))

    val b = guarded(build, "b")
      .withColumn("cx", expr(s"b_x div ${radius}L"))
      .withColumn("cy", expr(s"b_y div ${radius}L"))
      // 3×3 neighborhood replication of the BUILD side only; clamp at the
      // map edge (no wraparound) by dropping negative cells
      .withColumn("dxy", explode(expr(
        "array(struct(-1L as dx, -1L as dy), struct(-1L as dx, 0L as dy), struct(-1L as dx, 1L as dy), " +
          "struct(0L as dx, -1L as dy), struct(0L as dx, 0L as dy), struct(0L as dx, 1L as dy), " +
          "struct(1L as dx, -1L as dy), struct(1L as dx, 0L as dy), struct(1L as dx, 1L as dy))")))
      .withColumn("ncx", col("cx") + col("dxy.dx"))
      .withColumn("ncy", col("cy") + col("dxy.dy"))
      .where(col("ncx") >= 0 && col("ncy") >= 0)
      .select(col("b_id"), col("b_x"), col("b_y"),
        cellId(col("ncx"), col("ncy")).as("cell"))

    val d2 = (col("p_x") - col("b_x")) * (col("p_x") - col("b_x")) +
      (col("p_y") - col("b_y")) * (col("p_y") - col("b_y"))

    p.join(b, "cell")
      .where(d2 <= r2)
      .select(col("p_id"), col("b_id"), d2.as("d2"))
      .groupBy(col("p_id"))
      .agg(
        count(lit(1)).as("n_in_range"),
        // argmin with a total order: (d², b_id) lexicographic min
        min(struct(col("d2"), col("b_id"))).as("best"))
      .select(
        col("p_id"),
        col("n_in_range"),
        col("best.b_id").as("nearest_id"),
        col("best.d2").as("nearest_d2"))
  }
}
