package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Join-based iterative graph computation. The reference engine has no
 * graph surface; this exists for the training-data side of the house —
 * ranking domains/entities by link structure before sampling (the
 * "quality by connectivity" prior CommonCrawl pipelines use) — and as
 * the representative of the iterate-until-k family (label propagation,
 * HITS) expressed as unrolled DataFrame joins.
 *
 * Determinism policy: ranks live as integer micro-units of `scale`
 * and EVERY per-iteration operation is integer arithmetic —
 * contribution = pr div out-degree, damping = (17·Σ) div 20
 * (d = 0.85 as the rational 17/20), teleport = (3·base) div 20 —
 * so the fixed-iteration result is bit-identical on any engine and
 * any partitioning, and the DuckDB oracle replays it with unrolled
 * CTEs. The quantization error per iteration is < 1 unit per edge —
 * at `scale` = 1e9, noise in the 9th decimal of a rank.
 */
object GraphOps {

  /**
   * `iterations` rounds of damped PageRank over `edges` (`src`,
   * `dst`; supply both directions for an undirected walk). Every node
   * must have at least one outgoing edge (true by construction for
   * undirected graphs — dangling-node redistribution is deliberately
   * out of scope for the quantized form).
   *
   * Scale shape: each round is one edge-sized shuffle join
   * (edges ⋈ ranks on src — both sides hash-partitioned on the same
   * key, so AQE reuses the layout round to round) plus a node-sized
   * aggregate; the plan unrolls `iterations` deep. Past ~10 rounds
   * call `localCheckpoint()` on the returned frame between runs to
   * truncate lineage — at the 3-5 rounds ranking pipelines use,
   * the unrolled plan is the faster path (no materialization).
   * Output: (node, pr) with pr in micro-units (Σ pr ≈ scale).
   */
  def pageRank(edges: DataFrame, iterations: Int,
               scale: Long = 1000000000L): DataFrame = {
    require(iterations >= 1, s"pageRank iterations=$iterations")
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = edges.select(col("src").as("node")).distinct()
    // node count is a model-sized scalar (the one legitimate driver
    // value): base rank and teleport mass become exact integer literals
    val n = nodes.count()
    val base = scale / n
    val teleport = (3L * base) / 20L
    var ranks = nodes.withColumn("pr", lit(base))
    for (_ <- 1 to iterations) {
      val contrib = edges
        .join(ranks, edges("src") === ranks("node"))
        .join(deg, "src")
        .select(col("dst").as("node"), expr("pr div deg").as("c"))
        .groupBy("node").agg(sum("c").as("s"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          expr(s"$teleport + (17 * coalesce(s, CAST(0 AS BIGINT))) div 20").as("pr"))
    }
    ranks
  }

  /**
   * Personalized PageRank: identical integer recurrence, but the
   * teleport mass lands ONLY on `seeds` (`node` column) — the
   * "rank everything by proximity to a trusted set" prior that
   * web-scale pipelines use to turn a handful of vetted domains into
   * a corpus-wide quality score. Non-seed ranks start at zero and
   * earn mass purely through walks from the seed set; a node
   * unreachable from every seed stays exactly 0 (quantized truth,
   * not an epsilon).
   *
   * Same scale shape as [[pageRank]] plus one broadcast-sized seed
   * join per round (the seed set is small by definition).
   */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame, iterations: Int,
                           scale: Long = 1000000000L): DataFrame = {
    require(iterations >= 1, s"personalizedPageRank iterations=$iterations")
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = edges.select(col("src").as("node")).distinct()
    val seedSet = seeds.select(col("node")).distinct()
    val nSeeds = seedSet.count()
    require(nSeeds >= 1, "personalizedPageRank needs at least one seed")
    val base = scale / nSeeds
    val tele = (3L * base) / 20L
    val flagged = nodes
      .join(seedSet.withColumn("is_seed", lit(true)), Seq("node"), "left")
      .select(col("node"), coalesce(col("is_seed"), lit(false)).as("is_seed"))
    var ranks = flagged.select(col("node"),
      when(col("is_seed"), lit(base)).otherwise(lit(0L)).as("pr"))
    for (_ <- 1 to iterations) {
      val contrib = edges
        .join(ranks, edges("src") === ranks("node"))
        .join(deg, "src")
        .select(col("dst").as("node"), expr("pr div deg").as("c"))
        .groupBy("node").agg(sum("c").as("s"))
      ranks = flagged.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (when(col("is_seed"), lit(tele)).otherwise(lit(0L)) +
            expr("(17 * coalesce(s, CAST(0 AS BIGINT))) div 20")).as("pr"))
    }
    ranks
  }

  /**
   * HITS hubs & authorities (Kleinberg, "Authoritative sources in a
   * hyperlinked environment", JACM 1999) on a DIRECTED graph:
   * authority = sum of pointing hubs, hub = sum of pointed-to
   * authorities, each side L1-renormalized to `scale` after its step.
   * The natural fit for bipartite interaction data — here "which
   * entities does important activity point at, and which actors emit
   * important activity".
   *
   * Integer policy: the renormalization keeps each side's mass ≤
   * `scale`, so `raw · scale` stays under 2^63 and
   * `(raw * scale) div total` is exact bigint on both engines — the
   * normalization that makes unbounded-growth HITS replayable at all.
   * The total is a one-row aggregate cross-joined back (broadcast),
   * never a driver round-trip inside the loop.
   *
   * Output: (node, side='hub'|'auth', score). Scale shape per round:
   * two edge-sized shuffle joins + two node-sized aggregates.
   */
  def hits(edges: DataFrame, iterations: Int,
           scale: Long = 1000000000L): DataFrame = {
    require(iterations >= 1, s"hits iterations=$iterations")
    val hubs = edges.select(col("src").as("node")).distinct()
    val auths = edges.select(col("dst").as("node")).distinct()
    val nHubs = hubs.count()
    var hub = hubs.withColumn("score", lit(scale / nHubs))
    var auth: DataFrame = null
    def normalize(raw: DataFrame): DataFrame =
      raw.crossJoin(broadcast(raw.agg(sum("s").as("total"))))
        .select(col("node"), expr(s"(s * ${scale}L) div total").as("score"))
    for (_ <- 1 to iterations) {
      auth = normalize(
        edges.join(hub, edges("src") === hub("node"))
          .groupBy(col("dst").as("anode")).agg(sum("score").as("s"))
          .select(col("anode").as("node"), col("s")))
      hub = normalize(
        edges.join(auth, edges("dst") === auth("node"))
          .groupBy(col("src").as("hnode")).agg(sum("score").as("s"))
          .select(col("hnode").as("node"), col("s")))
    }
    hub.select(col("node"), lit("hub").as("side"), col("score"))
      .unionByName(auth.select(col("node"), lit("auth").as("side"), col("score")))
  }

  /**
   * Synchronous label propagation (Raghavan, Albert, Kumara, "Near
   * linear time algorithm to detect community structures in large-scale
   * networks", Phys. Rev. E 2007), made deterministic: every node
   * starts labeled with its own id, and each round simultaneously
   * adopts the PLURALITY label among its neighbors, ties broken to the
   * lexicographically smallest label. The random visit order and
   * random tie-break of the published algorithm are exactly what a
   * distributed engine cannot replay — the synchronous
   * plurality/min-label variant gives the same community-forming
   * behavior with a bit-identical fixed-round result on any engine and
   * any partitioning (the same policy that makes [[pageRank]]
   * oracle-replayable).
   *
   * Scale shape per round: one edge-sized shuffle join (labels onto
   * edge sources) + one (dst, label)-sized aggregate + one node-sized
   * plurality argmax — the argmax is a row_number window over the
   * count aggregate, so nothing bigger than the live (node, label)
   * pair set is ever sorted. Labels are node ids (strings), so the
   * frames stay two narrow columns deep regardless of graph size.
   * Supply both edge directions for an undirected graph; every node
   * must appear as a source (true for undirected). Fixed `iterations`
   * rather than convergence detection — synchronous LPA on bipartite
   * graphs can oscillate with period 2, so run-to-fixpoint is not
   * well-defined; the fixed-round result IS the contract.
   *
   * Output: (node, label), node-sized.
   */
  def labelPropagation(edges: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1, s"labelPropagation iterations=$iterations")
    val nodes = edges.select(col("src").as("node")).distinct()
    var labels = nodes.withColumn("label", col("node"))
    for (_ <- 1 to iterations) {
      val counts = edges
        .join(labels, edges("src") === labels("node"))
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("c"))
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy(col("dst"))
        .orderBy(col("c").desc, col("label").asc)
      labels = counts
        .withColumn("rn", row_number().over(win))
        .filter(col("rn") === 1)
        .select(col("dst").as("node"), col("label"))
    }
    labels
  }

  /**
   * Exact per-node triangle counts over an undirected graph —
   * clustering-coefficient numerators, the link-farm/community-density
   * signal next to PageRank's popularity. Input rows are (src, dst)
   * in either orientation, duplicates and self-loops tolerated.
   *
   * Uses DEGREE ORIENTATION (Schank–Wagner / forward counting): each
   * undirected edge points from its lower-(degree, id) endpoint to the
   * higher one, wedges open only at a node's out-edges, and the
   * closing edge is probed in that same single orientation — each
   * triangle materializes exactly once, with no double-count filter.
   * The orientation is the scale guarantee: out-degree is bounded by
   * O(√m) on any graph, so a celebrity node with 10⁸ neighbors opens
   * no 10¹⁶-row wedge set — its edges all point INTO it. Both joins
   * are equi joins on node keys; no cartesian anywhere.
   */
  private def undirect(edges: DataFrame): DataFrame = edges
    .select(least(col("src"), col("dst")).as("a"),
      greatest(col("src"), col("dst")).as("b"))
    .filter(col("a") =!= col("b")).distinct()

  private def degrees(und: DataFrame): DataFrame = und
    .select(explode(array(col("a"), col("b"))).as("node"))
    .groupBy("node").agg(count(lit(1)).as("deg"))

  def triangleParticipation(edges: DataFrame): DataFrame =
    triangleCore(undirect(edges))

  private def triangleCore(und: DataFrame): DataFrame = {
    val deg = degrees(und)
    val fwd = struct(col("da"), col("a")) < struct(col("db"), col("b"))
    // carry the far endpoint's degree: the wedge join below orients
    // each wedge by the same (deg, id) order the edges use, so only
    // the orientation whose closing edge can EXIST is generated —
    // `=!=` would emit both orientations and let the e3 probe kill
    // the wrong half, doubling the biggest shuffle in this plan
    // localCheckpoint: e1/e2/e3 all read this frame — without the pin
    // the distinct + two degree joins execute three times (measured as
    // the round-7 sf0.1 regression vs the plain a<b orientation, which
    // was cheap enough to triple-build). Edge-sized, 3 narrow columns;
    // released by the caller per the graft.core.Blocks convention.
    val oriented = und
      .join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "da"), "a")
      .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "db"), "b")
      .select(when(fwd, col("a")).otherwise(col("b")).as("u"),
        when(fwd, col("b")).otherwise(col("a")).as("v"),
        when(fwd, col("db")).otherwise(col("da")).as("dv"))
      .localCheckpoint()
    val tri = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.u") === col("e2.u") &&
          struct(col("e1.dv"), col("e1.v")) < struct(col("e2.dv"), col("e2.v")))
      .join(oriented.as("e3"),
        col("e3.u") === col("e1.v") && col("e3.v") === col("e2.v"))
      .select(col("e1.u").as("x"), col("e1.v").as("y"), col("e2.v").as("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  /**
   * Per-EDGE triangle support in canonical (a, b) form — the
   * [[triangleCore]] enumeration (degree orientation, each triangle
   * once) re-keyed to its three edges. Support is the k-truss
   * peeling currency.
   */
  private[graft] def trussSupport(und: DataFrame): DataFrame = {
    val deg = degrees(und)
    val fwd = struct(col("da"), col("a")) < struct(col("db"), col("b"))
    val oriented = und
      .join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "da"), "a")
      .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "db"), "b")
      .select(when(fwd, col("a")).otherwise(col("b")).as("u"),
        when(fwd, col("b")).otherwise(col("a")).as("v"),
        when(fwd, col("db")).otherwise(col("da")).as("dv"))
      .localCheckpoint()
    val tri = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.u") === col("e2.u") &&
          struct(col("e1.dv"), col("e1.v")) < struct(col("e2.dv"), col("e2.v")))
      .join(oriented.as("e3"),
        col("e3.u") === col("e1.v") && col("e3.v") === col("e2.v"))
      .select(col("e1.u").as("x"), col("e1.v").as("y"), col("e2.v").as("z"))
    tri.select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
      .union(tri.select(least(col("x"), col("z")).as("a"), greatest(col("x"), col("z")).as("b")))
      .union(tri.select(least(col("y"), col("z")).as("a"), greatest(col("y"), col("z")).as("b")))
      .groupBy("a", "b").agg(count(lit(1)).as("support"))
  }

  /**
   * k-TRUSS peeling (Cohen, "Trusses: cohesive subgraphs for social
   * network analysis", NSA TR 2008): `rounds` iterations of "drop
   * every edge in fewer than k−2 triangles of the CURRENT subgraph,
   * recompute". The truss is the community-core detector a crawl
   * graph pipeline runs above k-core — k-core keeps hubs with many
   * weak ties, k-truss demands the ties triangulate, so link farms
   * (stars with no closure) peel away while genuine communities
   * survive. With `rounds` ≥ the peel depth the output IS the
   * k-truss; fixed rounds keep the fold engine-replayable (the
   * connectedComponents convention — the oracle unrolls the same
   * count).
   *
   * Scale shape: support is enumerated ONCE (the [[triangleCore]]
   * plan — degree-oriented wedges, out-degree O(√m), hub-proof); each
   * peel round then DECREMENTS support along the triangles its
   * deleted edges killed instead of re-counting the survivors (the
   * standard truss-decomposition refinement). A round's work is sized
   * by the DELETED edges: dying triangles come from a min-degree-
   * oriented wedge probe (Σ min-deg over deleted edges — a hub-star's
   * own degree never multiplies), deduped by canonical (x<y<z) key so
   * a triangle losing two edges at once decrements its survivor
   * exactly once. Rounds stop at the FIXPOINT (a round that deletes
   * nothing — detected exactly, the componentsStars convention), so
   * excess `rounds` on a converged graph cost one empty-delete check
   * instead of a full re-enumeration each. `localCheckpoint` pins
   * each round's support frame (caller releases via
   * graft.core.Blocks).
   *
   * Output: surviving (a, b, support) with support measured on the
   * FINAL subgraph (0 for edges whose last triangles died in the
   * final peel — visible non-convergence, never silent). The
   * maintained count IS that support: after each round,
   * support(e) = #triangles of the peeled graph containing e — the
   * invariant the recompute-equivalence spec pins.
   */
  def kTruss(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 3 && k <= 64, s"kTruss k=$k")
    require(rounds >= 1 && rounds <= 8, s"kTruss rounds=$rounds")
    val thr = (k - 2).toLong
    val e0 = undirect(edges).localCheckpoint()
    var sup = e0.join(trussSupport(e0), Seq("a", "b"), "left")
      .select(col("a"), col("b"), coalesce(col("support"), lit(0L)).as("support"))
      .localCheckpoint()
    var r = 0
    var converged = false
    while (r < rounds && !converged) {
      val deleted = sup.filter(col("support") < thr)
        .select("a", "b").localCheckpoint()
      if (deleted.isEmpty) converged = true
      else {
        val und = sup.select("a", "b")
        val adj = und.union(und.select(col("b").as("a"), col("a").as("b")))
        // the triangles dying this round lived in the CURRENT graph
        // (deleted edges included); probe common neighbors from the
        // lower-degree endpoint so a deleted hub edge costs min-deg,
        // not hub-deg
        val deg = degrees(und)
        val fwd = struct(col("da"), col("a")) <= struct(col("db"), col("b"))
        val ordered = deleted
          .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
          .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
          .select(when(fwd, col("a")).otherwise(col("b")).as("u"),
            when(fwd, col("b")).otherwise(col("a")).as("v"))
        val dying = ordered
          .join(adj.select(col("a").as("u"), col("b").as("w")), Seq("u"))
          .filter(col("w") =!= col("v"))
          .join(adj.select(col("a").as("v"), col("b").as("w")), Seq("v", "w"))
          // canonical key: a triangle reached from two deleted edges
          // (or from both endpoints) must decrement its survivors once
          .select(array_sort(array(col("u"), col("v"), col("w"))).as("t"))
          .select(element_at(col("t"), 1).as("x"), element_at(col("t"), 2).as("y"),
            element_at(col("t"), 3).as("z"))
          .distinct()
        val dec = dying.select(col("x").as("a"), col("y").as("b"))
          .union(dying.select(col("x").as("a"), col("z").as("b")))
          .union(dying.select(col("y").as("a"), col("z").as("b")))
          .groupBy("a", "b").agg(count(lit(1)).as("d"))
        // deleted edges leave by the >= thr filter; their dying-triangle
        // decrements land only on edges still present
        sup = sup.filter(col("support") >= thr)
          .join(dec, Seq("a", "b"), "left")
          .select(col("a"), col("b"),
            (col("support") - coalesce(col("d"), lit(0L))).as("support"))
          .localCheckpoint()
      }
      r += 1
    }
    sup
  }

  /**
   * Local clustering coefficient per node: `2·T / (deg·(deg−1))` in
   * integer MICRO units (`floor`-divided, so both engines derive the
   * same LONG from the same exact T and deg — no float ratio to
   * drift). Degree-1 and isolated-in-triangle-terms nodes report 0
   * with `n_triangles` 0 via the left join; every node of the
   * undirected graph gets a row. The density signal that separates a
   * tight community (coef → 1) from a hub spraying unrelated links
   * (coef → 0) at equal PageRank.
   */
  def clusteringCoefficient(edges: DataFrame): DataFrame = {
    // the canonical edge set is the shared input of the degree table
    // and the triangle core; dedup it once (distinct = one shuffle)
    // and let AQE reuse that exchange on both consumers
    val und = undirect(edges)
    val deg = degrees(und)
    deg.join(triangleCore(und), Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("deg") >= 2,
            IntDiv(lit(2000000L) * coalesce(col("n_triangles"), lit(0L)),
              col("deg") * (col("deg") - 1L)).cast("long"))
          .otherwise(0L).as("coef_micro"))
  }

  /**
   * Link prediction scores for NON-edges sharing at least `minCommon`
   * neighbors: the three classical structural scores — common-neighbor
   * count, neighborhood Jaccard (exact ppm: `cn·10⁶ div (da+db−cn)`),
   * and preferential attachment (`da·db`) — every one an exact LONG,
   * no float similarity to drift between engines. This is the
   * "suggest missing edges" primitive: entity-resolution candidate
   * pairs from a co-occurrence graph, or related-domain discovery
   * before corpus sampling.
   *
   * Plan: candidate pairs come from WEDGES — both oriented adjacency
   * rows meet at their shared center z, emitting (u < v) once per
   * common neighbor; one groupBy folds the wedge multiset into the
   * cn count, an anti join removes pairs that are ALREADY edges, and
   * two node-keyed degree joins price the Jaccard/PA columns. No
   * all-pairs anywhere: the exchange is Σ_z deg(z)² wedge rows.
   *
   * `maxHubDeg` is the stop-hub rule that makes that sum linear: a
   * center with 10⁶ neighbors would open 10¹² wedges while asserting
   * almost nothing (everyone co-occurs with a celebrity — the same
   * non-discrimination argument as the winnowing/jaccard df caps),
   * so wedges only open at centers with deg ≤ `maxHubDeg`. Degrees
   * and the anti-join edge set still use the FULL graph — only wedge
   * centering is capped, exactly MOSS-style.
   *
   * Output: (node_a, node_b, common, jaccard_ppm, pref_attach),
   * node_a < node_b.
   */
  def linkPrediction(edges: DataFrame, minCommon: Long = 2L,
                     maxHubDeg: Long = 1000L): DataFrame = {
    val und = undirect(edges).localCheckpoint()
    val deg = degrees(und)
    // oriented adjacency (node -> nbr) in both directions; wedge
    // centers join their degree once so the hub cap is a scan filter
    val adj = und.select(col("a").as("node"), col("b").as("nbr"))
      .union(und.select(col("b").as("node"), col("a").as("nbr")))
    val capped = adj.join(deg.filter(col("deg") <= maxHubDeg), "node")
      .select(col("node"), col("nbr"))
    val cn = capped.as("x")
      .join(capped.as("y"),
        col("x.node") === col("y.node") && col("x.nbr") < col("y.nbr"))
      .select(col("x.nbr").as("node_a"), col("y.nbr").as("node_b"))
      .groupBy("node_a", "node_b").agg(count(lit(1)).as("common"))
      .filter(col("common") >= minCommon)
    cn.join(und, cn("node_a") === und("a") && cn("node_b") === und("b"),
        "left_anti")
      .join(deg.select(col("node").as("node_a"), col("deg").as("da")), "node_a")
      .join(deg.select(col("node").as("node_b"), col("deg").as("db")), "node_b")
      .select(col("node_a"), col("node_b"), col("common"),
        IntDiv(col("common") * 1000000L,
          col("da") + col("db") - col("common")).as("jaccard_ppm"),
        (col("da") * col("db")).as("pref_attach"))
  }

  /**
   * Newman–Girvan modularity of a node partition: Q = Σ_c (e_c/m −
   * (d_c/2m)²) over communities c, with e_c = intra-community edges,
   * d_c = summed degrees, m = |E| — THE quality gauge for a community
   * assignment (Q ≈ 0: no better than random wiring; Q ≳ 0.3: real
   * structure), the number you read before trusting
   * [[labelPropagation]]'s labels. Exact RATIONAL over the common
   * denominator 4m²: `q_num = Σ_c (4m·e_c − d_c²)`, `q_den = 4m²`,
   * both LONGs, plus `q_milli = floor(1000·num/den)` through one
   * double chain (LONG envelope: 4m·e_c and d_c² under 2⁶³ — m to
   * ~10⁹ edges).
   *
   * `labels` is (node, label). Nodes missing a label drop from the
   * degree sums AND their edges from e_c (inner joins — a partial
   * partition is scored on the subgraph it covers). Shape: one
   * distinct + degree aggregate, two node-keyed label joins,
   * community-sized aggregates folded to one row.
   */
  def modularity(edges: DataFrame, labels: DataFrame): DataFrame = {
    val und = undirect(edges).localCheckpoint()
    val deg = degrees(und)
    val lab = labels.select(col("node"), col("label"))
    val m = und.count()
    require(m >= 1, "modularity needs at least one undirected edge")
    val intra = und
      .join(lab.select(col("node").as("a"), col("label").as("la")), "a")
      .join(lab.select(col("node").as("b"), col("label").as("lb")), "b")
      .filter(col("la") === col("lb"))
      .groupBy(col("la").as("label")).agg(count(lit(1)).as("ec"))
    val dsum = deg.join(lab, "node")
      .groupBy("label").agg(sum(col("deg")).as("dc"))
    val perC = dsum.join(intra, Seq("label"), "left")
      .select(col("label"), coalesce(col("ec"), lit(0L)).as("ec"), col("dc"))
    perC.agg(count(lit(1)).as("n_communities"),
        sum(lit(4L) * lit(m) * col("ec") - col("dc") * col("dc")).as("q_num"))
      .select(lit(m).as("m"), col("n_communities"),
        col("q_num"), lit(4L * m * m).as("q_den"),
        floor(col("q_num") * lit(1000.0) / lit(4.0 * m * m)).cast("long").as("q_milli"))
  }

  /**
   * Weighted PageRank: [[pageRank]]'s integer recurrence with each
   * edge carrying a LONG weight — contribution = `(pr·w) div Σw(src)`
   * instead of `pr div deg`; damping and teleport unchanged (17/20
   * rational). The walk follows traffic, not topology: a host cited
   * by 1000 documents pulls 1000× the mass of a once-cited one
   * through the same single co-citation edge. Same bit-identical
   * replay contract as the unweighted form (unrolled-CTE oracle).
   *
   * LONG envelope: `pr·w < 2⁶³` — pr ≤ scale (1e9 default), so
   * weights up to ~9·10⁹ are safe; co-occurrence counts qualify at
   * any corpus size that fits a LONG count. Same per-round shape as
   * [[pageRank]]: one edge-sized shuffle join + a node-sized
   * aggregate per iteration.
   */
  def weightedPageRank(edges: DataFrame, iterations: Int,
                       scale: Long = 1000000000L): DataFrame = {
    require(iterations >= 1, s"weightedPageRank iterations=$iterations")
    val wdeg = edges.groupBy("src").agg(sum(col("w")).as("wdeg"))
    val nodes = edges.select(col("src").as("node")).distinct()
    val n = nodes.count()
    val base = scale / n
    val teleport = (3L * base) / 20L
    var ranks = nodes.withColumn("pr", lit(base))
    for (_ <- 1 to iterations) {
      val contrib = edges
        .join(ranks, edges("src") === ranks("node"))
        .join(wdeg, "src")
        .select(col("dst").as("node"), expr("(pr * w) div wdeg").as("c"))
        .groupBy("node").agg(sum("c").as("s"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          expr(s"$teleport + (17 * coalesce(s, CAST(0 AS BIGINT))) div 20").as("pr"))
    }
    ranks
  }

  /**
   * Bipartite projection: from (left, right) incidence rows, the
   * co-occurrence graph on the RIGHT side — one `(node_a < node_b,
   * w)` edge per right-pair sharing ≥ 1 left neighbor, `w` = the
   * shared-neighbor count. THE graph-construction step between raw
   * incidence data and every graph operator here: doc↔host becomes
   * host co-citation, user↔item becomes item co-consumption,
   * doc↔entity becomes an entity graph.
   *
   * `maxLeftDeg` is the stop-hub rule ([[linkPrediction]]'s): a left
   * node incident to d rights opens d² projected pairs while
   * asserting near-nothing (everything co-occurs inside a mega-doc),
   * so projection only walks left nodes with degree ≤ the cap —
   * Σd² stays linear, and the dropped hubs are exactly the
   * non-discriminative ones. Dedup of (left, right) rows is built in
   * (incidence is a SET, so a repeated link cannot inflate w).
   */
  def bipartiteProject(edges: DataFrame, maxLeftDeg: Long = 1000L): DataFrame = {
    // grouped-pairs plan (the jaccardPairs shape): ONE exchange groups
    // the distinct rights per left (collect_set is the built-in dedup,
    // so the separate distinct + degree aggregate + cap join + self-
    // join of the previous formulation — four exchanges and a double
    // evaluation of the incidence scan — collapse into this single
    // aggregate), the cap is an array-size filter, and pair generation
    // is the codegen'd C(n,2) expansion bounded by cap² per group.
    edges.groupBy("left").agg(collect_set(col("right")).as("rs"))
      .filter(size(col("rs")) >= 2 && size(col("rs")) <= maxLeftDeg)
      .select(explode(DedupOps.orderedPairs("rs")).as("p"))
      .select(col("p.id_a").as("node_a"), col("p.id_b").as("node_b"))
      .groupBy("node_a", "node_b").agg(count(lit(1)).as("w"))
  }

  /**
   * Degree assortativity (Newman 2002): the Pearson correlation of
   * endpoint degrees over all DIRECTED edge occurrences (each
   * undirected edge contributes both orientations — the standard
   * convention that makes Σx = Σy and the two variance factors equal,
   * collapsing Pearson's square root away: r = (M·Σxy − Σx²) /
   * (M·Σx² − (Σx)²), an exact RATIONAL). Positive r = hubs attach to
   * hubs (social cores), negative = hubs attach to leaves
   * (star/broadcast topologies, most link farms) — the one-number
   * topology fingerprint next to [[clusteringCoefficient]]'s
   * per-node view.
   *
   * Output is ONE row of exact LONGs (m2 = 2|E|, sum_xy, sum_x,
   * sum_x2) plus `r_milli = floor(1000·num/den)` through the same
   * double chain on both engines (num, den exact LONGs first — the
   * [[MultimodalOps.sampleFeatures]] floor-over-double precedent;
   * LONG envelope: M·maxdeg² < 2⁶³, stated because num·den products
   * never form). Degenerate regular graphs (den = 0) report
   * r_milli = 0.
   *
   * Shape: one distinct + one degree aggregate + two node-keyed
   * joins, folded to a single row — nothing is corpus-sized after
   * the edge scan.
   */
  def assortativity(edges: DataFrame): DataFrame = {
    val und = undirect(edges).localCheckpoint()
    val deg = degrees(und)
    val paired = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
    paired.agg(
        (count(lit(1)) * 2L).as("m2"),
        (sum(col("da") * col("db")) * 2L).as("sum_xy"),
        sum(col("da") + col("db")).as("sum_x"),
        sum(col("da") * col("da") + col("db") * col("db")).as("sum_x2"))
      .withColumn("num", col("m2") * col("sum_xy") - col("sum_x") * col("sum_x"))
      .withColumn("den", col("m2") * col("sum_x2") - col("sum_x") * col("sum_x"))
      .select(col("m2"), col("sum_xy"), col("sum_x"), col("sum_x2"),
        when(col("den") =!= 0L,
            floor(col("num") * lit(1000.0) / col("den")).cast("long"))
          .otherwise(lit(0L)).as("r_milli"))
  }

  /**
   * `rounds` rounds of k-core peeling: repeatedly delete every node
   * whose CURRENT degree is < k (deleting a node lowers its
   * neighbors' degrees, which is why this iterates), then report the
   * surviving nodes with their degree inside the surviving subgraph.
   * The fixed-round form is the engine-portable contract — both this
   * plan and the unrolled-CTE oracle run exactly `rounds` peels, so
   * the result replays bit-for-bit whether or not the peel has
   * converged (it converges once no round deletes a node; each
   * non-converged round deletes ≥ 1, so `rounds` ≥ |V| is always
   * exact — in practice peeling stabilizes in a handful of rounds).
   *
   * The k-core is the standard "dense-interaction backbone"
   * extractor: bot rings and tight communities survive high k while
   * drive-by interactions peel away — the densification complement
   * to [[clusteringCoefficient]]'s per-node view.
   *
   * Scale shape per round: one node-sized degree aggregate + one
   * semi join keeping edges whose BOTH endpoints survive; the edge
   * frame is localCheckpoint'd each round (the loop would otherwise
   * stack `rounds` joins of lineage onto every successor — same
   * policy as the dedup cluster build). Blocks are released by the
   * caller per the graft.core.Blocks convention.
   */
  def kCore(edges: DataFrame, k: Long, rounds: Int): DataFrame = {
    require(rounds >= 1 && k >= 1, s"kCore k=$k rounds=$rounds")
    var und = undirect(edges).localCheckpoint()
    for (_ <- 1 to rounds) {
      val keep = degrees(und).filter(col("deg") >= k)
        .select(col("node"))
      und = und
        .join(keep.withColumnRenamed("node", "a"), "a")
        .join(keep.withColumnRenamed("node", "b"), "b")
        .select(col("a"), col("b"))
        .localCheckpoint()
    }
    degrees(und).select(col("node"), col("deg"))
  }

  /**
   * Connected components by HASH-MIN propagation: every node starts
   * as its own component id, and each round adopts the minimum id
   * among itself and its neighbors — after `rounds` rounds a node
   * carries the smallest id within graph distance `rounds`, so any
   * component of diameter ≤ `rounds` is exactly labeled by its
   * minimum node id. Fixed rounds keep the result deterministic and
   * oracle-replayable (the same unrolled propagation runs in SQL);
   * convergence is observable in the output — rerunning with
   * rounds+1 and diffing is the standard check, and the per-round
   * message volume is edge-sized either way.
   *
   * Scale: each round is ONE shuffle join (edges ⋈ labels on the
   * src key) + a node-keyed min aggregate with map-side partials,
   * localCheckpoint'd so the unrolled lineage never recomputes. This
   * is the large-star/small-star family's simple member
   * (Kiveris et al., "Connected Components in MapReduce", SOCC'14);
   * the alternating-star variant trades more rounds-logic for
   * o(diameter) rounds — at 100 TB swap the round body, keep the
   * loop. Input rows are (src, dst) in either orientation; self-loops
   * and duplicates tolerated.
   */
  /**
   * Degree-distribution histogram with the complementary CDF: one row
   * per occurring degree — (deg, n_nodes, ccdf_ppm), where ccdf_ppm =
   * 10⁶·P(D ≥ deg) by exact integer division over a running suffix
   * sum. The log-log CCDF is the plot [[powerLawFit]]'s α summarizes;
   * this emits the underlying curve so a fit can be eyeballed against
   * its data (CSN's own methodological point: never trust α without
   * the curve). All integers.
   *
   * Plan: degree aggregate → degree-histogram aggregate (both
   * map-side combinable) → one window over the HISTOGRAM rows
   * (distinct-degree-sized, hundreds at worst — not a node-sized
   * sort).
   */
  def degreeHistogram(edges: DataFrame): DataFrame = {
    val deg = degrees(undirect(edges))
    val hist = deg.groupBy("deg").agg(count(lit(1)).as("n_nodes"))
    val n = deg.agg(count(lit(1)).as("n_total"))
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("deg").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    hist.crossJoin(broadcast(n))
      .withColumn("n_ge", sum(col("n_nodes")).over(win))
      .select(col("deg"), col("n_nodes"),
        IntDiv(col("n_ge") * 1000000L, col("n_total")).cast("long").as("ccdf_ppm"))
  }

  /**
   * Rich-club coefficient (Colizza et al., Nature Physics 2006):
   * φ(k) = 2·E_k / (N_k·(N_k−1)) — among the nodes of degree > k, the
   * fraction of possible edges actually present. Read WITH
   * [[powerLawFit]]: a heavy tail says hubs exist, the rich-club
   * curve says whether they INTERCONNECT (φ rising with k = a core
   * the hub-cap rules must break up) or stay spokes. Exact ppm by
   * integer division; φ = 0 when fewer than two nodes qualify.
   *
   * Plan: one degree aggregate, two id-keyed joins to annotate each
   * edge with both endpoint degrees, then one |ks|-way conditional
   * explode + aggregate — edge-linear with a small constant; no pair
   * enumeration anywhere (E_k counts EXISTING edges only).
   */
  def richClub(edges: DataFrame, ks: Seq[Long]): DataFrame = {
    require(ks.nonEmpty, "richClub needs at least one k")
    val und = undirect(edges).localCheckpoint()
    val deg = degrees(und)
    val annotated = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
    val eRich = annotated
      .select(explode(typedLit(ks)).as("k"), col("da"), col("db"))
      .filter(col("da") > col("k") && col("db") > col("k"))
      .groupBy("k").agg(count(lit(1)).as("e_rich"))
    val nRich = deg
      .select(explode(typedLit(ks)).as("k"), col("deg"))
      .filter(col("deg") > col("k"))
      .groupBy("k").agg(count(lit(1)).as("n_rich"))
    // the k spine keeps EMPTY levels in the output (an all-spoke graph
    // at high k is a finding, not a missing row)
    edges.sparkSession.range(1)
      .select(explode(typedLit(ks)).as("k"))
      .join(nRich, Seq("k"), "left")
      .join(eRich, Seq("k"), "left")
      .select(col("k"),
        coalesce(col("n_rich"), lit(0L)).as("n_rich"),
        coalesce(col("e_rich"), lit(0L)).as("e_rich"),
        when(coalesce(col("n_rich"), lit(0L)) >= 2L,
          IntDiv(coalesce(col("e_rich"), lit(0L)) * 2000000L,
            col("n_rich") * (col("n_rich") - 1L)).cast("long"))
          .otherwise(lit(0L)).as("phi_ppm"))
  }

  /**
   * Power-law degree-distribution fit: the continuous-approximation
   * MLE α = 1 + n / Σ ln(d_i/(d_min − ½)) (Clauset–Shalizi–Newman,
   * SIAM Review 2009, eq. 3.1) over tail nodes (degree ≥ d_min) —
   * the one-row topology fingerprint read before trusting any
   * hub-capped plan: α near 2 means hubs own the edge mass and every
   * Σdeg² bound is live, α near 3+ means degrees are tame. Each
   * logarithm is quantized to exact MICRO units BEFORE the corpus
   * sum (floor(10⁶·ln 2d) − floor(10⁶·ln(2d_min−1)) — both `ln`s of
   * exact integers, the t_pmi micro-log rule), so the reduction is
   * an integer sum: partitioning-order-free and oracle-replayable,
   * where a double Σln would drift with shuffle order. Output
   * α in milli units: 1000 + (n_tail·10⁹) div Σ_micro.
   */
  def powerLawFit(edges: DataFrame, dMin: Long = 2L): DataFrame = {
    require(dMin >= 1L, s"powerLawFit dMin=$dMin")
    val deg = degrees(undirect(edges))
    val micro = (floor(log(col("deg").cast("double") * 2.0) * 1e6) -
      floor(log(lit((2 * dMin - 1).toDouble)) * 1e6)).cast("long")
    deg.agg(
        count(lit(1)).as("n_nodes"),
        max(col("deg")).as("d_max"),
        sum(when(col("deg") >= dMin, 1L).otherwise(0L)).as("n_tail"),
        sum(when(col("deg") >= dMin, micro).otherwise(0L)).as("s_micro"))
      .select(col("n_nodes"), lit(dMin).as("d_min"), col("d_max"), col("n_tail"),
        // n_tail == 0 ⇒ s_micro == 0 (deg==dMin contributes > 0 micro):
        // guard the integer division — NULL is the defined degenerate
        // output (engines disagree on x // 0, Spark yields NULL anyway
        // only under non-ANSI; make it explicit and oracle-mirrored)
        when(col("n_tail") > 0L,
          (lit(1000L) + IntDiv(col("n_tail") * 1000000000L, col("s_micro")))
            .cast("long"))
          .otherwise(lit(null).cast("long")).as("alpha_milli"))
  }

  /**
   * Bounded-radius HARMONIC centrality: H(v) = Σ 1/d(u,v) over nodes
   * within `radius` hops, as the exact integer Σ floor(scale/d)
   * (1000/1, 1000/2, 1000/3 … — milli units, engine-portable). The
   * radius cap is the standard production form (Boldi–Vigna's
   * centrality surveys use r-truncated harmonic when full BFS is
   * unaffordable); distances come from `radius` rounds of frontier
   * expansion with a left-anti "seen" filter, so each pair is priced
   * at its TRUE minimum distance.
   *
   * Scale shape: round r is one (pairs ⋈ adjacency) shuffle join plus
   * a left-anti dedup against the seen set — all id-only rows;
   * `localCheckpoint` pins each round like [[kCore]]. Memory is the
   * r-hop pair set, so the operator contract requires BOUNDED-degree
   * graphs at scale (on hub-heavy graphs, cap degree upstream the way
   * [[bipartiteProject]] does, or move to [[hyperBallHarmonic]] —
   * the HLL-neighborhood form whose per-node state is bounded by 2^p
   * registers regardless of degree; this exact form remains the
   * auditable small-radius variant: exact distances, no sketch error).
   */
  def harmonicCentrality(edges: DataFrame, radius: Int,
                         scale: Long = 1000L): DataFrame = {
    require(radius >= 1 && radius <= 6, s"harmonicCentrality radius=$radius")
    val und = undirect(edges).localCheckpoint()
    val adj = und.union(und.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint()
    var frontier = adj.select(col("a").as("src"), col("b").as("node"))
      .distinct()
      .withColumn("d", lit(1L))
      .localCheckpoint()
    var all = frontier
    for (r <- 2 to radius) {
      val expanded = frontier.join(adj, frontier("node") === adj("a"))
        .select(col("src"), col("b").as("node"))
        .filter(col("src") =!= col("node"))
        .distinct()
      val fresh = expanded
        .join(all.select("src", "node"), Seq("src", "node"), "left_anti")
        .withColumn("d", lit(r.toLong))
        .localCheckpoint()
      all = all.union(fresh).localCheckpoint()
      frontier = fresh
    }
    all.groupBy(col("src").as("node"))
      .agg(sum(IntDiv(lit(scale), col("d"))).as("h_milli"),
        count(lit(1)).as("n_reach"))
      .select(col("node"), col("h_milli").cast("long").as("h_milli"), col("n_reach"))
  }

  /**
   * Pivot-sampled Brandes betweenness centrality — the last classic
   * centrality family member next to harmonic/Lin/closeness/PageRank/
   * HITS: how often a node sits INSIDE other nodes' shortest paths
   * (Brandes, "A Faster Algorithm for Betweenness Centrality", J.
   * Math. Sociology 2001; pivot estimation per Brandes & Pich,
   * "Centrality Estimation in Large Networks", IJBC 2007). Exact
   * all-pairs Brandes is Θ(n·m) — a non-starter at corpus scale — so
   * the estimator runs the exact single-source accumulation from a
   * deterministic PIVOT set only: the `pivots` nodes with the
   * smallest (md5Head60(node), node) rank, the same seedless uniform
   * sample as [[SimilarityOps.farthestPointSampleCoreset]]'s pool.
   * BFS is distance-bounded at `radius` (the [[harmonicCentrality]]
   * convention — unbounded exact BFS is the same non-starter in pair
   * form), so the estimate is the bounded-distance betweenness
   * restricted to the pivot sources.
   *
   * Determinism (the quantized-credit contract): per source, the
   * level-synchronous BFS carries exact LONG shortest-path counts
   * σ(s,v) = Σ_{u∈pred(v)} σ(s,u); the dependency sweep runs the
   * levels backwards with per-edge integer credit
   * c(v,w) = σv·(10⁶ + δ(w)) div σw and δ(v) = Σ_{w∈succ(v)} c(v,w) —
   * each edge term floors independently, so the sum is partition- and
   * engine-order independent, and the value is EXACT Brandes ×10⁶
   * whenever the σ divisions are exact (spec-pinned on hand graphs).
   *
   * Scale shape: pair state is bounded by pivots × ball(radius) —
   * NEVER n² — and each of the 2·radius rounds is one frontier ⋈ adj
   * shuffle plus a grouped sum, with `localCheckpoint` pinning rounds
   * exactly like [[kCore]]. The pivot rank is one distributed top-k;
   * nothing corpus-sized reaches the driver. Output: (node, bc_ppm)
   * for EVERY node of the graph (zeros kept — leaves are the point),
   * bc_ppm = Σ_pivots δ_s(node)·10⁶ over s ≠ node.
   */
  def betweennessPivots(edges: DataFrame, radius: Int, pivots: Int,
                        scale: Long = 1000000L): DataFrame = {
    require(radius >= 1 && radius <= 6, s"betweennessPivots radius=$radius")
    require(pivots >= 1 && pivots <= 256, s"betweennessPivots pivots=$pivots")
    val und = undirect(edges).localCheckpoint()
    val adj = und.union(und.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint()
    val nodes = adj.select(col("a").as("node")).distinct().localCheckpoint()
    val piv = nodes
      .orderBy(FastHash.md5Head60(col("node").cast("string")).asc, col("node").asc)
      .limit(pivots)
      .select(col("node").as("s"))
      .localCheckpoint()
    // forward: level-synchronous BFS with exact path counts. A node
    // joins the level of its FIRST visit (anti-join against seen), and
    // its sigma sums over ALL preds in the previous level.
    val levels = new Array[DataFrame](radius + 1)
    levels(0) = piv.select(col("s"), col("s").as("node"), lit(1L).as("sigma"))
      .localCheckpoint()
    var seen = levels(0).select("s", "node").localCheckpoint()
    for (t <- 1 to radius) {
      val expanded = levels(t - 1).join(adj, levels(t - 1)("node") === adj("a"))
        .groupBy(col("s"), col("b").as("node"))
        .agg(sum(col("sigma")).as("sigma"))
      levels(t) = expanded
        .join(seen, Seq("s", "node"), "left_anti")
        .localCheckpoint()
      seen = seen.union(levels(t).select("s", "node")).localCheckpoint()
    }
    // backward: dependency accumulation, deepest level first. δ at the
    // deepest level is 0, so its up-edges carry pure endpoint credit.
    var delta: DataFrame = null // (s, node, delta) for the level below
    var bc: DataFrame = null
    for (t <- radius to 1 by -1) {
      val down = levels(t).select(col("s"), col("node").as("w"), col("sigma").as("sw"))
      val withDelta =
        if (delta == null) down.withColumn("dw", lit(0L))
        else down.join(delta.select(col("s"), col("node").as("w"), col("delta").as("dw")),
          Seq("s", "w"), "left").withColumn("dw", coalesce(col("dw"), lit(0L)))
      val up = levels(t - 1)
        .join(adj, levels(t - 1)("node") === adj("a"))
        .select(col("s"), col("node").as("v"), col("sigma").as("sv"), col("b").as("w"))
        .join(withDelta, Seq("s", "w"))
        .select(col("s"), col("v"),
          IntDiv(col("sv") * (lit(scale) + col("dw")), col("sw")).as("c"))
      delta = up.groupBy(col("s"), col("v").as("node"))
        .agg(sum(col("c")).as("delta"))
        .localCheckpoint()
      val contrib = delta.filter(col("node") =!= col("s"))
      bc = if (bc == null) contrib else bc.union(contrib)
    }
    val scored = bc.groupBy("node").agg(sum(col("delta")).as("bc_ppm"))
    nodes.join(scored, Seq("node"), "left")
      .select(col("node"), coalesce(col("bc_ppm"), lit(0L)).as("bc_ppm"))
  }

  /**
   * HyperBall harmonic centrality (Boldi & Vigna, "In-Core Computation
   * of Geometric Centralities with HyperBall", ICDMW 2013) — the
   * UNBOUNDED-radius upgrade [[harmonicCentrality]]'s scaladoc names:
   * each node carries a deterministic HLL counter of its ball
   * B(v, t) = {u : d(u,v) ≤ t}; round t max-merges every neighbor's
   * registers into the node's own, so |B(v,t)| needs no pair set —
   * the r-hop pair frontier (Θ(n·deg^r) on hubs) becomes n × ≤2^p
   * register rows, and each round is ONE edge ⋈ register shuffle plus
   * a (node, register) max-aggregate, hub-degree-proof by construction.
   * Harmonic centrality falls out of the ball-size deltas:
   * H(v) = Σ_t (|B(v,t)| − |B(v,t−1)|)/t.
   *
   * Determinism: the registers are [[SketchOps.hllRegisters]]' md5
   * convention, so every round's table — and therefore the estimate
   * sequence — replays bit-for-bit in the DuckDB oracle as unrolled
   * register recurrences. Deltas are clamped at 0 (the raw↔linear-
   * counting branch switch can step the integer estimate down even
   * though registers only grow) and accumulate as exact integers:
   * harmonic_micro = Σ_t (Δ_milli · 1000) div t.
   *
   * Scale shape: per-round state is at most n·2^p register rows
   * (p = 8 → 256·8 B/node ceiling, reached only by nodes whose ball
   * saturates the sketch); the merge shuffle is |E| × (registers per
   * node) — linear in edges with a fixed constant, NO dependence on
   * ball size beyond 2^p. `localCheckpoint` pins each round's
   * registers and fold state exactly like [[kCore]]. Accuracy is the
   * standard HLL ±1.04/√2^p (6.5% at p = 8); raise p for tighter
   * balls, the cost is linear in 2^p.
   *
   * Output: (node, ball_milli — |B(v, rounds)| in HLL millis,
   * harmonic_micro).
   */
  def hyperBallHarmonic(edges: DataFrame, rounds: Int, p: Int = 8): DataFrame = {
    require(rounds >= 1 && rounds <= 32, s"hyperBallHarmonic rounds=$rounds")
    val und = undirect(edges).localCheckpoint()
    val adj = und.union(und.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint()
    harmonicFromAdj(adj, rounds, p)
  }

  /**
   * DIRECTED HyperBall harmonic centrality — the orientation
   * Boldi–Vigna actually run on webgraphs: `direction` "out" grows
   * B_out(v, t) = {u : v reaches u in ≤ t hops} (round t max-merges
   * each node's OUT-neighbors' registers — the propagation runs
   * AGAINST edge direction, so reachability flows along it), "in"
   * runs the same recurrence on the transposed edge set and grows
   * "who reaches me" — the centrality reading (a page is central when
   * many pages reach it in few hops). Identical register machinery,
   * determinism, and scale shape as [[hyperBallHarmonic]]; the
   * symmetrizing union is simply dropped, which is the whole
   * difference. Self-loops are excluded and parallel edges deduped,
   * matching the undirected canonicalization; isolated-direction
   * nodes (a pure sink in "out" mode) still carry their singleton
   * ball — node registers seed from BOTH endpoints of the edge set.
   *
   * Output: (node, ball_milli, harmonic_micro) — harmonic over
   * directed distances, Σ_t Δ|B(v,t)|/t.
   */
  def hyperBallHarmonicDirected(edges: DataFrame, rounds: Int, p: Int = 8,
                                direction: String = "out"): DataFrame = {
    require(rounds >= 1 && rounds <= 32, s"hyperBallHarmonicDirected rounds=$rounds")
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    val adj = (direction match {
      case "out" => e.select(col("src").as("a"), col("dst").as("b"))
      case "in"  => e.select(col("dst").as("a"), col("src").as("b"))
      case other => throw new IllegalArgumentException(
        s"hyperBallHarmonicDirected direction must be out|in, got: $other")
    }).localCheckpoint()
    harmonicFromAdj(adj, rounds, p)
  }

  /** The HyperBall register recurrence + harmonic fold over an
    * already-oriented adjacency (a receives b's registers): shared by
    * the undirected and directed entry points. Nodes seed from BOTH
    * endpoint columns so direction-isolated nodes keep their
    * singleton ball. */
  private def harmonicFromAdj(adj: DataFrame, rounds: Int, p: Int): DataFrame = {
    val nodes = adj.select(col("a").as("node"))
      .union(adj.select(col("b").as("node"))).distinct()
    var regs = SketchOps.hllRegisters(
        nodes.select(col("node"), col("node").as("_v")), Seq("node"), "_v", p)
      .localCheckpoint()
    // fold state: (node, prev ball estimate, harmonic accumulator)
    var state = SketchOps.hllFromRegisters(regs, Seq("node"), p)
      .select(col("node"), col("est_milli").as("_prev"), lit(0L).as("_h"))
      .localCheckpoint()
    for (t <- 1 to rounds) {
      val msgs = adj.join(regs, adj("b") === regs("node"))
        .select(adj("a").as("node"), regs("_idx"), regs("_r"))
      regs = regs.union(msgs)
        .groupBy("node", "_idx").agg(max(col("_r")).as("_r"))
        .localCheckpoint()
      val cur = SketchOps.hllFromRegisters(regs, Seq("node"), p)
        .select(col("node"), col("est_milli").as("_cur"))
      state = state.join(cur, Seq("node"))
        .select(col("node"), col("_cur").as("_prev"),
          (col("_h") + IntDiv(
            greatest(col("_cur") - col("_prev"), lit(0L)) * lit(1000L),
            lit(t.toLong))).cast("long").as("_h"))
        .localCheckpoint()
    }
    state.select(col("node"), col("_prev").as("ball_milli"),
      col("_h").as("harmonic_micro"))
  }

  /**
   * Per-node BALL PROFILE from the HyperBall register recurrence —
   * the distance-distribution summary Boldi–Vigna derive alongside
   * harmonic centrality: for every node, the final ball estimate, the
   * MEDIAN distance t_median (smallest t whose ball holds ≥ half the
   * final mass — the per-node "how far is my world" number), and the
   * total-distance mass Σ_t t·Δ_t (the closeness denominator: divide
   * ball² by it for closeness, read it raw for reach cost). One more
   * finisher over the exact state [[hyperBallHarmonic]] already
   * builds — same determinism, same per-round shuffles, plus one
   * (rounds+1)-rows-per-node window at the end (bounded by the round
   * count, never by the graph).
   *
   * Output: (node, ball_milli, t_median, sum_dist_milli).
   */
  def hyperBallProfile(edges: DataFrame, rounds: Int, p: Int = 8): DataFrame = {
    require(rounds >= 1 && rounds <= 32, s"hyperBallProfile rounds=$rounds")
    val und = undirect(edges).localCheckpoint()
    val adj = und.union(und.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint()
    profileFromAdj(adj, rounds, p)
  }

  /**
   * DIRECTED ball profile — [[hyperBallProfile]] on out-balls
   * ("how far does my reach extend", direction "out") or in-balls
   * ("how far do my readers sit", "in"): the same median-distance +
   * total-distance-mass finisher over the directed register
   * recurrence of [[hyperBallHarmonicDirected]], whose adjacency
   * conventions (strict self-loop/dup hygiene, both-endpoint node
   * seeding) this shares verbatim.
   */
  def hyperBallProfileDirected(edges: DataFrame, rounds: Int, p: Int = 8,
                               direction: String = "out"): DataFrame = {
    require(rounds >= 1 && rounds <= 32, s"hyperBallProfileDirected rounds=$rounds")
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    val adj = (direction match {
      case "out" => e.select(col("src").as("a"), col("dst").as("b"))
      case "in"  => e.select(col("dst").as("a"), col("src").as("b"))
      case other => throw new IllegalArgumentException(
        s"hyperBallProfileDirected direction must be out|in, got: $other")
    }).localCheckpoint()
    profileFromAdj(adj, rounds, p)
  }

  /** The ball-profile recurrence + finisher over an already-oriented
    * adjacency — shared by the undirected and directed entry points
    * (the harmonicFromAdj pattern). */
  private def profileFromAdj(adj: DataFrame, rounds: Int, p: Int): DataFrame = {
    val nodes = adj.select(col("a").as("node"))
      .union(adj.select(col("b").as("node"))).distinct()
    var regs = SketchOps.hllRegisters(
        nodes.select(col("node"), col("node").as("_v")), Seq("node"), "_v", p)
      .localCheckpoint()
    def estAt(t: Int): DataFrame =
      SketchOps.hllFromRegisters(regs, Seq("node"), p)
        .select(col("node"), lit(t.toLong).as("t"), col("est_milli"))
    var all = estAt(0)
    for (t <- 1 to rounds) {
      val msgs = adj.join(regs, adj("b") === regs("node"))
        .select(adj("a").as("node"), regs("_idx"), regs("_r"))
      regs = regs.union(msgs)
        .groupBy("node", "_idx").agg(max(col("_r")).as("_r"))
        .localCheckpoint()
      all = all.union(estAt(t))
    }
    val fin = all.filter(col("t") === rounds)
      .select(col("node"), col("est_milli").as("_fin"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("node")).orderBy(col("t"))
    all.join(fin, "node")
      .withColumn("_delta",
        when(col("t") > 0L,
          greatest(col("est_milli") - lag(col("est_milli"), 1).over(w), lit(0L)))
          .otherwise(lit(0L)))
      .groupBy("node")
      .agg(
        max(when(col("t") === rounds, col("est_milli"))).as("ball_milli"),
        min(when(col("est_milli") * 2L >= col("_fin"), col("t"))).as("t_median"),
        sum(col("_delta") * col("t")).cast("long").as("sum_dist_milli"))
  }

  /**
   * LIN'S INDEX — the closeness variant Boldi & Vigna recommend for
   * graphs with unreachable pairs ("Axioms for centrality", Internet
   * Math 2014): classic closeness 1/Σd rewards nodes that reach
   * almost NOTHING (a 2-node island beats the giant component's
   * center); Lin's |R(v)|²/Σ_{u∈R(v)} d(v,u) weights by the square of
   * the coreachable set so reaching more always helps. Computed from
   * the same register state as [[hyperBallProfile]]:
   * lin_milli = 1000·|B|²/Σd = ball_milli² div sum_dist_milli (the
   * milli factors cancel to exactly one), in decimal cross-products
   * so the square stays exact past the LONG envelope (|B| > ~3M). A node whose ball never grew (Σd = 0)
   * takes Lin's defined value 1 — isolated nodes stay comparable
   * instead of dividing by zero.
   *
   * Output: (node, ball_milli, sum_dist_milli, lin_milli).
   */
  def hyperBallLin(edges: DataFrame, rounds: Int, p: Int = 8): DataFrame =
    linFromProfile(hyperBallProfile(edges, rounds, p))

  /** DIRECTED Lin's index — the [[hyperBallLin]] arithmetic over the
    * directed profile state: "out" weights forward REACH (a crawl
    * seed's value), "in" weights AUDIENCE (who can get here — the
    * authority reading). Same conventions as every directed HyperBall
    * member. */
  def hyperBallLinDirected(edges: DataFrame, rounds: Int, p: Int = 8,
                           direction: String = "out"): DataFrame =
    linFromProfile(hyperBallProfileDirected(edges, rounds, p, direction))

  private def linFromProfile(profile: DataFrame): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    // units: ball = 1000·|B|, sum = 1000·Σd, so 1000·|B|²/Σd reduces
    // to exactly ball²/sum — one decimal square, one integral division
    profile
      .select(col("node"), col("ball_milli"), col("sum_dist_milli"),
        when(col("sum_dist_milli") > 0L,
          IntDiv(dec(col("ball_milli")) * dec(col("ball_milli")),
            dec(col("sum_dist_milli"))))
          .otherwise(lit(1000L)).cast("long").as("lin_milli"))
  }

  /**
   * The NEIGHBORHOOD FUNCTION N(t) = Σ_v |B(v,t)| via the same
   * HyperBall register recurrence as [[hyperBallHarmonic]] — the
   * graph-scale distance-distribution summary (Palmer et al.'s ANF,
   * KDD 2002; Boldi–Vigna's HyperBall is its HLL form): one row per
   * round with the estimated reachable-pair count, its cumulative
   * share of the final round's mass (ppm), and the ≥90% flag whose
   * first true row IS the effective diameter — the number a 100 TB
   * graph job reads to size any fixed-round unrolling (PageRank
   * depth, component rounds) before paying for it.
   *
   * Scale shape: identical to [[hyperBallHarmonic]] per round, plus
   * ONE register-table-sized aggregate per round folding to a single
   * row — output is `rounds+1` rows total, driver-safe at any graph
   * size. Deterministic-HLL discipline throughout; the DuckDB oracle
   * replays every round's register table and the final ppm fold.
   */
  def hyperBallNeighborhood(edges: DataFrame, rounds: Int, p: Int = 8): DataFrame = {
    require(rounds >= 1 && rounds <= 32, s"hyperBallNeighborhood rounds=$rounds")
    val und = undirect(edges).localCheckpoint()
    val adj = und.union(und.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint()
    val nodes = adj.select(col("a").as("node")).distinct()
    var regs = SketchOps.hllRegisters(
        nodes.select(col("node"), col("node").as("_v")), Seq("node"), "_v", p)
      .localCheckpoint()
    def roundSum(t: Int): DataFrame =
      SketchOps.hllFromRegisters(regs, Seq("node"), p)
        .agg(sum(col("est_milli")).as("npairs_milli"))
        .select(lit(t.toLong).as("t"), col("npairs_milli"))
    var out = roundSum(0)
    for (t <- 1 to rounds) {
      val msgs = adj.join(regs, adj("b") === regs("node"))
        .select(adj("a").as("node"), regs("_idx"), regs("_r"))
      regs = regs.union(msgs)
        .groupBy("node", "_idx").agg(max(col("_r")).as("_r"))
        .localCheckpoint()
      out = out.union(roundSum(t))
    }
    val fin = out.filter(col("t") === rounds)
      .select(col("npairs_milli").as("_final"))
    out.crossJoin(fin) // one-row broadcast
      // degenerate-input guard (the powerLawFit n_tail==0 convention):
      // an empty edge set leaves _final null/zero — NULL is the defined
      // output there, never an engine-dependent division result
      .select(col("t"), col("npairs_milli"),
        when(col("_final") > 0L,
          IntDiv(col("npairs_milli") * 1000000L, col("_final")).cast("long"))
          .otherwise(lit(null).cast("long")).as("frac_ppm"))
      .withColumn("ge90", col("frac_ppm") >= 900000L)
  }

  /**
   * Connected components by ALTERNATING star contraction (the
   * two-phase small-star/large-star algorithm of Kiveris et al.,
   * "Connected Components in MapReduce and Beyond", SoCC 2014) — the
   * o(diameter)-round answer to [[connectedComponents]]'s hash-min,
   * whose round count is the graph diameter. Each round:
   *
   *  - large-star: every node u links its LARGER neighbors directly
   *    to m = min(Γ(u) ∪ u) — long chains halve;
   *  - small-star: with edges oriented high→low, every node u links
   *    its smaller neighbors (and itself) to the minimum — stars
   *    flatten.
   *
   * Both emit canonical (u > v) edges, so each phase is one
   * edge-sized groupBy + join; `localCheckpoint` per round pins
   * lineage exactly like [[kCore]]. Convergence is detected by the
   * (count, xxhash64-xor) signature of the edge set being a
   * fixpoint — one extra no-op round instead of a frame diff. At the
   * fixpoint every node carries an edge to its component minimum, so
   * the output is the star read off directly: (node, comp) with
   * comp = the component's least node id, centers included.
   *
   * Scale shape: O(log² n) rounds w.h.p. (chains of length L need
   * ~log L, vs L for hash-min); every step is linear in |E| with
   * id-only shuffles — no adjacency lists, no node-state explosion.
   */
  def componentsStars(edges: DataFrame, maxRounds: Int = 16): DataFrame = {
    require(maxRounds >= 1, s"componentsStars maxRounds=$maxRounds")
    // canonical high→low orientation (u > v), deduped
    var e = undirect(edges)
      .select(col("b").as("u"), col("a").as("v"))
      .localCheckpoint()
    def signature(df: DataFrame): (Long, Long) = {
      // bit_xor, not sum: order-independent AND overflow-free under ANSI
      val r = df.agg(count(lit(1)), coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var sig = signature(e)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      // large-star: m(u) = min over Γ⁺(u); larger neighbors re-point to m
      val nb = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = nb.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val ls = nb.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
      // small-star: already high→low; everything including u re-points
      // to the group minimum
      val mins2 = ls.groupBy("u").agg(min("v").as("m"))
      val ss = ls.join(mins2, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(mins2.select(col("u"), col("m").as("v")))
        .distinct()
        .localCheckpoint()
      val nsig = signature(ss)
      converged = nsig == sig
      sig = nsig
      e = ss
      round += 1
    }
    // mid-contraction edges are NOT component labels — a path-like
    // graph past ~2^maxRounds diameter would otherwise emit silently
    // wrong (node, comp) rows while the scaladoc promises the fixpoint
    require(converged,
      s"componentsStars did not converge in $maxRounds rounds; raise maxRounds " +
        "(O(log^2 n) suffice w.h.p., but adversarial chains can need more)")
    // fixpoint stars: every non-center points at its component min
    e.groupBy("u").agg(min("v").as("comp"))
      .select(col("u").as("node"), col("comp"))
      .union(
        e.select(col("v")).distinct()
          .join(e.select(col("u")).distinct(), col("v") === col("u"), "left_anti")
          .select(col("v").as("node"), col("v").as("comp")))
  }

  def connectedComponents(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"connectedComponents rounds=$rounds")
    val und = undirect(edges).localCheckpoint()
    val adj = und.union(und.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint()
    var comp = adj.select(col("a").as("node")).distinct()
      .withColumn("comp", col("node"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val msgs = adj.join(comp, adj("a") === comp("node"))
        .select(col("b").as("node"), col("comp"))
      comp = msgs.union(comp.select(col("node"), col("comp")))
        .groupBy("node").agg(min("comp").as("comp"))
        .localCheckpoint()
    }
    comp
  }
}
