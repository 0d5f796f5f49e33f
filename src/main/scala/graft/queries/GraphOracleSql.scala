package graft.queries

import graft.graph.TpchGraph

/** DuckDB oracle SQL for the iterative graph algorithms: fixed-round
  * loops unrolled into chained CTEs, mirroring the Spark loop body
  * round-for-round over the same gid encoding
  * ([[graft.graph.TpchGraph.gidSqlEdges]]) / co-purchase derivation.
  *
  * Every per-round CTE is `MATERIALIZED`: each round is referenced by
  * the next round twice (state + aggregate/scalar), and without the hint
  * DuckDB inlines the chain into an exponentially re-evaluated tree
  * (measured: 10-round PageRank 199 s inlined vs 0.2 s materialized at
  * sf0.01).
  *
  * Fixpoint algorithms (cc, k-core) are unrolled with measured-fixpoint
  * + margin rounds: both loop bodies are idempotent past their fixpoint
  * (min-label can't decrease below the component minimum; peeling a
  * stable core removes nothing), so any round count ≥ the fixpoint
  * yields exactly the Spark result. Fixed-iteration algorithms
  * (pagerank, label propagation) unroll exactly the Spark iteration
  * count.
  */
object GraphOracleSql {

  /** Co-purchase graph mirror of [[GraphOps.copurchaseGraph]]: distinct
    * part pairs sharing an order (canonical a<b), undirected edge list
    * as both directions, nodes = every part referenced by lineitem.
    */
  private val copurchase: String =
    """op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       ce AS MATERIALIZED (
         SELECT a.l_partkey AS a, b.l_partkey AS b
         FROM op a JOIN op b
         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         GROUP BY 1, 2),
       und AS MATERIALIZED (SELECT a, b FROM ce UNION ALL SELECT b AS a, a AS b FROM ce),
       pnodes AS MATERIALIZED (SELECT DISTINCT l_partkey AS gid FROM lineitem)"""

  /** Unrolled PageRank over the heterogeneous gid graph — the SQL mirror
    * of [[graft.graph.Algorithms.pageRankLoop]]: per round, the dangling
    * mass is the previous round's rank over outdeg-null nodes, each
    * node's new rank is (1-d)·tele + d·(in-contributions + dm·tele).
    * `seedSql` Some(q) concentrates the teleport vector on q's gid set
    * (personalized variant); None means uniform 1/n.
    */
  def pageRankSql(iters: Int, damping: Double, seedSql: Option[String]): String = {
    val (seedCte, tele, baseJoin) = seedSql match {
      case Some(q) => (
        s"seeds AS MATERIALIZED ($q),",
        "CASE WHEN s.gid IS NOT NULL THEN 1.0 / (SELECT count(*) FROM seeds) ELSE 0.0 END",
        "LEFT JOIN seeds s ON n.gid = s.gid")
      case None => ("", "1.0 / (SELECT count(*) FROM nodes)", "")
    }
    val rounds = (1 to iters).map { i =>
      s""",
       r$i AS MATERIALIZED (
         SELECT b.gid, b.outdeg, b.tele,
                (1.0 - $damping) * b.tele + $damping * (coalesce(c.contrib, 0.0) +
                  (SELECT coalesce(sum(pr), 0.0) FROM r${i - 1} WHERE outdeg IS NULL) * b.tele) AS pr
         FROM base b LEFT JOIN (
           SELECT e.gdst AS cgid, sum(r.pr / r.outdeg) AS contrib
           FROM e JOIN r${i - 1} r ON e.gsrc = r.gid
           GROUP BY e.gdst) c ON b.gid = c.cgid)"""
    }.mkString
    s"""WITH nodes AS MATERIALIZED (${TpchGraph.gidSqlNodes}),
       e AS MATERIALIZED (${TpchGraph.gidSqlEdges}),
       $seedCte
       deg AS (SELECT gsrc, count(*) AS outdeg FROM e GROUP BY gsrc),
       base AS MATERIALIZED (
         SELECT n.gid, d.outdeg, $tele AS tele
         FROM nodes n LEFT JOIN deg d ON n.gid = d.gsrc $baseJoin),
       r0 AS MATERIALIZED (SELECT gid, outdeg, tele, tele AS pr FROM base)$rounds
       SELECT ${TpchGraph.gidSqlLabel} AS label, gid % 4294967296 AS key, pr
       FROM (SELECT gid, round(pr, 8) AS pr FROM r$iters ORDER BY pr DESC, gid LIMIT 100)"""
  }

  /** Unrolled Katz centrality — round bodies mirror
    * [[graft.graph.Algorithms.katz]] exactly: x₀ = 1,
    * xᵢ = 1 + α·Σ_{u→v} xᵢ₋₁(u); top-100 by the 8 dp-sealed value.
    */
  def katzSql(iters: Int, alpha: Double): String = {
    val rounds = (1 to iters).map { i =>
      s""",
       k$i AS MATERIALIZED (
         SELECT n.gid, 1.0 + $alpha * coalesce(c.contrib, 0.0) AS x
         FROM nodes n LEFT JOIN (
           SELECT e.gdst AS cgid, sum(k.x) AS contrib
           FROM e JOIN k${i - 1} k ON e.gsrc = k.gid
           GROUP BY e.gdst) c ON n.gid = c.cgid)"""
    }.mkString
    s"""WITH nodes AS MATERIALIZED (${TpchGraph.gidSqlNodes}),
       e AS MATERIALIZED (${TpchGraph.gidSqlEdges}),
       k0 AS MATERIALIZED (
         SELECT gid, CAST(1.0 AS DOUBLE) AS x FROM nodes)$rounds
       SELECT ${TpchGraph.gidSqlLabel} AS label, gid % 4294967296 AS key,
              x AS katz
       FROM (SELECT gid, round(x, 8) AS x FROM k$iters
             ORDER BY x DESC, gid LIMIT 100)"""
  }

  /** Unrolled INCREMENTAL Katz — [[katzSql]]'s round body over the
    * base/full table split of [[pageRankIncrSql]]: `baseIters` rounds
    * on the base graph (delta orders excluded), the 10 dp-sealed
    * handoff (fresh nodes seed at the cold x₀ = 1.0, DOUBLE-cast —
    * the decimal-literal trap), `warmIters` rounds on the full graph.
    */
  def katzIncrSql(baseIters: Int, warmIters: Int, alpha: Double): String = {
    def round(prev: String, cur: String, e: String, nodes: String) =
      s""",
       $cur AS MATERIALIZED (
         SELECT n.gid, 1.0 + $alpha * coalesce(c.contrib, 0.0) AS x
         FROM $nodes n LEFT JOIN (
           SELECT e.gdst AS cgid, sum(k.x) AS contrib
           FROM $e e JOIN $prev k ON e.gsrc = k.gid
           GROUP BY e.gdst) c ON n.gid = c.cgid)"""
    val baseRounds = (1 to baseIters)
      .map(i => round(s"b${i - 1}", s"b$i", "e_b", "nodes_b")).mkString
    val warmRounds = (1 to warmIters)
      .map(i => round(s"r${i - 1}", s"r$i", "e", "nodes")).mkString
    s"""WITH nodes_b AS MATERIALIZED (
         SELECT gid FROM (${TpchGraph.gidSqlNodes})
         WHERE NOT (gid // 4294967296 = 5 AND (gid % 4294967296) % 10 = 0)),
       e_b AS MATERIALIZED (
         SELECT gsrc, gdst FROM (${TpchGraph.gidSqlEdges})
         WHERE NOT (gsrc // 4294967296 = 5 AND (gsrc % 4294967296) % 10 = 0)
           AND NOT (gdst // 4294967296 = 5 AND (gdst % 4294967296) % 10 = 0)),
       b0 AS MATERIALIZED (
         SELECT gid, CAST(1.0 AS DOUBLE) AS x FROM nodes_b)$baseRounds,
       nodes AS MATERIALIZED (${TpchGraph.gidSqlNodes}),
       e AS MATERIALIZED (${TpchGraph.gidSqlEdges}),
       r0 AS MATERIALIZED (
         SELECT n.gid, coalesce(round(p.x, 10), CAST(1.0 AS DOUBLE)) AS x
         FROM nodes n LEFT JOIN b$baseIters p ON n.gid = p.gid)$warmRounds
       SELECT ${TpchGraph.gidSqlLabel} AS label, gid % 4294967296 AS key,
              x AS katz
       FROM (SELECT gid, round(x, 8) AS x FROM r$warmIters
             ORDER BY x DESC, gid LIMIT 100)"""
  }

  /** Unrolled INCREMENTAL PageRank — the SQL mirror of the warm-start
    * path ([[graft.queries.GraphOps.gPagerankIncr]]): `baseIters`
    * rounds over the BASE graph (delta orders and their edges
    * excluded), a seeded handoff (prior vector rounded at 10 dp where
    * known, teleport mass for new nodes — the seal-before-compare
    * float discipline applied at the state boundary), then `warmIters`
    * rounds over the FULL graph. Round bodies are byte-identical to
    * [[pageRankSql]]'s; only the edge/base tables and the r0 seed
    * differ. Hash-green at the driver gate therefore proves the Spark
    * warm-start computes exactly the claimed arithmetic — the
    * g_cc_incr "incremental ≡ declared recurrence" discipline for rank
    * state.
    */
  def pageRankIncrSql(baseIters: Int, warmIters: Int, damping: Double,
      seedSql: Option[String] = None): String = {
    // seeded teleport (the PPR variant): the seed set lives entirely in
    // the base graph (customers are never delta order nodes), so ONE
    // seeds CTE concentrates the teleport vector in both phases
    val (seedCte, teleB, joinB, tele, join) = seedSql match {
      case Some(q) => (
        s"seeds AS MATERIALIZED ($q),",
        "CASE WHEN s.gid IS NOT NULL THEN 1.0 / (SELECT count(*) FROM seeds) ELSE 0.0 END",
        "LEFT JOIN seeds s ON n.gid = s.gid",
        "CASE WHEN s.gid IS NOT NULL THEN 1.0 / (SELECT count(*) FROM seeds) ELSE 0.0 END",
        "LEFT JOIN seeds s ON n.gid = s.gid")
      case None => ("",
        "1.0 / (SELECT count(*) FROM nodes_b)", "",
        "1.0 / (SELECT count(*) FROM nodes)", "")
    }
    def round(prev: String, cur: String, e: String, base: String) =
      s""",
       $cur AS MATERIALIZED (
         SELECT b.gid, b.outdeg, b.tele,
                (1.0 - $damping) * b.tele + $damping * (coalesce(c.contrib, 0.0) +
                  (SELECT coalesce(sum(pr), 0.0) FROM $prev WHERE outdeg IS NULL) * b.tele) AS pr
         FROM $base b LEFT JOIN (
           SELECT e.gdst AS cgid, sum(r.pr / r.outdeg) AS contrib
           FROM $e e JOIN $prev r ON e.gsrc = r.gid
           GROUP BY e.gdst) c ON b.gid = c.cgid)"""
    val baseRounds = (1 to baseIters)
      .map(i => round(s"b${i - 1}", s"b$i", "e_b", "base_b")).mkString
    val warmRounds = (1 to warmIters)
      .map(i => round(s"r${i - 1}", s"r$i", "e", "base")).mkString
    s"""WITH nodes_b AS MATERIALIZED (
         SELECT gid FROM (${TpchGraph.gidSqlNodes})
         WHERE NOT (gid // 4294967296 = 5 AND (gid % 4294967296) % 10 = 0)),
       e_b AS MATERIALIZED (
         SELECT gsrc, gdst FROM (${TpchGraph.gidSqlEdges})
         WHERE NOT (gsrc // 4294967296 = 5 AND (gsrc % 4294967296) % 10 = 0)
           AND NOT (gdst // 4294967296 = 5 AND (gdst % 4294967296) % 10 = 0)),
       $seedCte
       deg_b AS (SELECT gsrc, count(*) AS outdeg FROM e_b GROUP BY gsrc),
       base_b AS MATERIALIZED (
         SELECT n.gid, d.outdeg, $teleB AS tele
         FROM nodes_b n LEFT JOIN deg_b d ON n.gid = d.gsrc $joinB),
       b0 AS MATERIALIZED (SELECT gid, outdeg, tele, tele AS pr FROM base_b)$baseRounds,
       nodes AS MATERIALIZED (${TpchGraph.gidSqlNodes}),
       e AS MATERIALIZED (${TpchGraph.gidSqlEdges}),
       deg AS (SELECT gsrc, count(*) AS outdeg FROM e GROUP BY gsrc),
       base AS MATERIALIZED (
         SELECT n.gid, d.outdeg, $tele AS tele
         FROM nodes n LEFT JOIN deg d ON n.gid = d.gsrc $join),
       r0 AS MATERIALIZED (
         SELECT b.gid, b.outdeg, b.tele,
                coalesce(round(p.pr, 10), b.tele) AS pr
         FROM base b LEFT JOIN b$baseIters p ON b.gid = p.gid)$warmRounds
       SELECT ${TpchGraph.gidSqlLabel} AS label, gid % 4294967296 AS key, pr
       FROM (SELECT gid, round(pr, 8) AS pr FROM r$warmIters ORDER BY pr DESC, gid LIMIT 100)"""
  }

  /** Unrolled INCREMENTAL WEIGHTED PageRank — [[pageRankIncrSql]]'s
    * weighted twin: `baseIters` weighted rounds over the base graph
    * (fractions from base-graph weighted out-degrees), the 10 dp-sealed
    * handoff, `warmIters` weighted rounds over the full graph
    * (fractions from FULL-graph out-degrees — exactly what the Spark
    * fold's touched-source re-bake produces).
    */
  def weightedPageRankIncrSql(baseIters: Int, warmIters: Int,
      damping: Double): String = {
    def round(prev: String, cur: String, e: String, base: String) =
      s""",
       $cur AS MATERIALIZED (
         SELECT b.gid, b.outdeg, b.tele,
                (1.0 - $damping) * b.tele + $damping * (coalesce(c.contrib, 0.0) +
                  (SELECT coalesce(sum(pr), 0.0) FROM $prev WHERE outdeg IS NULL) * b.tele) AS pr
         FROM $base b LEFT JOIN (
           SELECT e.gdst AS cgid, sum(r.pr * e.frac) AS contrib
           FROM $e e JOIN $prev r ON e.gsrc = r.gid
           GROUP BY e.gdst) c ON b.gid = c.cgid)"""
    val baseRounds = (1 to baseIters)
      .map(i => round(s"b${i - 1}", s"b$i", "e_b", "base_b")).mkString
    val warmRounds = (1 to warmIters)
      .map(i => round(s"r${i - 1}", s"r$i", "e", "base")).mkString
    s"""WITH nodes_b AS MATERIALIZED (
         SELECT gid FROM (${TpchGraph.gidSqlNodes})
         WHERE NOT (gid // 4294967296 = 5 AND (gid % 4294967296) % 10 = 0)),
       e0_b AS MATERIALIZED (
         SELECT gsrc, gdst, w FROM (${TpchGraph.gidSqlWeightedEdges})
         WHERE NOT (gsrc // 4294967296 = 5 AND (gsrc % 4294967296) % 10 = 0)
           AND NOT (gdst // 4294967296 = 5 AND (gdst % 4294967296) % 10 = 0)),
       wdeg_b AS MATERIALIZED (SELECT gsrc, sum(w) AS wout FROM e0_b GROUP BY gsrc),
       e_b AS MATERIALIZED (
         SELECT e0_b.gsrc, e0_b.gdst, e0_b.w / d.wout AS frac
         FROM e0_b JOIN wdeg_b d USING (gsrc)),
       base_b AS MATERIALIZED (
         SELECT n.gid, d.wout AS outdeg, 1.0 / (SELECT count(*) FROM nodes_b) AS tele
         FROM nodes_b n LEFT JOIN wdeg_b d ON n.gid = d.gsrc),
       b0 AS MATERIALIZED (SELECT gid, outdeg, tele, tele AS pr FROM base_b)$baseRounds,
       nodes AS MATERIALIZED (${TpchGraph.gidSqlNodes}),
       e0 AS MATERIALIZED (${TpchGraph.gidSqlWeightedEdges}),
       wdeg AS MATERIALIZED (SELECT gsrc, sum(w) AS wout FROM e0 GROUP BY gsrc),
       e AS MATERIALIZED (
         SELECT e0.gsrc, e0.gdst, e0.w / d.wout AS frac
         FROM e0 JOIN wdeg d USING (gsrc)),
       base AS MATERIALIZED (
         SELECT n.gid, d.wout AS outdeg, 1.0 / (SELECT count(*) FROM nodes) AS tele
         FROM nodes n LEFT JOIN wdeg d ON n.gid = d.gsrc),
       r0 AS MATERIALIZED (
         SELECT b.gid, b.outdeg, b.tele,
                coalesce(round(p.pr, 10), b.tele) AS pr
         FROM base b LEFT JOIN b$baseIters p ON b.gid = p.gid)$warmRounds
       SELECT ${TpchGraph.gidSqlLabel} AS label, gid % 4294967296 AS key, pr
       FROM (SELECT gid, round(pr, 8) AS pr FROM r$warmIters ORDER BY pr DESC, gid LIMIT 100)"""
  }

  /** Unrolled WEIGHTED PageRank — the SQL mirror of
    * [[graft.graph.Algorithms.weightedPageRank]]: identical round
    * structure to [[pageRankSql]], but rank distributes along out-edges
    * in proportion to weight. The per-edge fraction w/wout is a
    * materialized loop invariant exactly as the Spark layout bakes it
    * (weights are integral doubles, so wout sums are exact in any
    * order and the fraction is one deterministic division); `outdeg`
    * in the base is the weighted out-degree, null ⇒ dangling.
    */
  def weightedPageRankSql(iters: Int, damping: Double): String = {
    val rounds = (1 to iters).map { i =>
      s""",
       r$i AS MATERIALIZED (
         SELECT b.gid, b.outdeg, b.tele,
                (1.0 - $damping) * b.tele + $damping * (coalesce(c.contrib, 0.0) +
                  (SELECT coalesce(sum(pr), 0.0) FROM r${i - 1} WHERE outdeg IS NULL) * b.tele) AS pr
         FROM base b LEFT JOIN (
           SELECT e.gdst AS cgid, sum(r.pr * e.frac) AS contrib
           FROM e JOIN r${i - 1} r ON e.gsrc = r.gid
           GROUP BY e.gdst) c ON b.gid = c.cgid)"""
    }.mkString
    s"""WITH nodes AS MATERIALIZED (${TpchGraph.gidSqlNodes}),
       e0 AS MATERIALIZED (${TpchGraph.gidSqlWeightedEdges}),
       wdeg AS MATERIALIZED (SELECT gsrc, sum(w) AS wout FROM e0 GROUP BY gsrc),
       e AS MATERIALIZED (
         SELECT e0.gsrc, e0.gdst, e0.w / d.wout AS frac
         FROM e0 JOIN wdeg d USING (gsrc)),
       base AS MATERIALIZED (
         SELECT n.gid, d.wout AS outdeg, 1.0 / (SELECT count(*) FROM nodes) AS tele
         FROM nodes n LEFT JOIN wdeg d ON n.gid = d.gsrc),
       r0 AS MATERIALIZED (SELECT gid, outdeg, tele, tele AS pr FROM base)$rounds
       SELECT ${TpchGraph.gidSqlLabel} AS label, gid % 4294967296 AS key, pr
       FROM (SELECT gid, round(pr, 8) AS pr FROM r$iters ORDER BY pr DESC, gid LIMIT 100)"""
  }

  /** Unrolled HITS over the heterogeneous gid graph — the SQL mirror of
    * [[graft.graph.Algorithms.hits]]: per round, auth = in-sum of hubs
    * then hub = out-sum of auths, UNNORMALIZED (the recurrence is
    * linear, so norms factor out), both L1-normalized once at the end —
    * exactly the Spark loop's arithmetic. Top-100 by ROUNDED authority
    * so cross-engine summation ULP noise cannot flip the cutoff (same
    * rationale as [[pageRankSql]]).
    */
  def hitsSql(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s""",
       a$i AS MATERIALIZED (
         SELECT b.gid, coalesce(c.raw, 0.0) AS auth
         FROM base b LEFT JOIN (
           SELECT e.gdst AS agid, sum(h.hub) AS raw
           FROM e JOIN h${i - 1} h ON e.gsrc = h.gid GROUP BY e.gdst) c
         ON b.gid = c.agid),
       h$i AS MATERIALIZED (
         SELECT b.gid, coalesce(c.raw, 0.0) AS hub
         FROM base b LEFT JOIN (
           SELECT e.gsrc AS hgid, sum(a.auth) AS raw
           FROM e JOIN a$i a ON e.gdst = a.gid GROUP BY e.gsrc) c
         ON b.gid = c.hgid)"""
    }.mkString
    s"""WITH nodes AS MATERIALIZED (${TpchGraph.gidSqlNodes}),
       e AS MATERIALIZED (${TpchGraph.gidSqlEdges}),
       base AS MATERIALIZED (SELECT gid FROM nodes),
       h0 AS MATERIALIZED (SELECT gid, CAST(1.0 AS DOUBLE) AS hub FROM base)$rounds,
       afin AS MATERIALIZED (
         SELECT b.gid, coalesce(c.raw, 0.0) AS auth
         FROM base b LEFT JOIN (
           SELECT e.gdst AS agid, sum(h.hub) AS raw
           FROM e JOIN h$iters h ON e.gsrc = h.gid GROUP BY e.gdst) c
         ON b.gid = c.agid),
       norms AS (
         SELECT (SELECT sum(auth) FROM afin) AS asum,
                (SELECT sum(hub) FROM h$iters) AS hsum)
       SELECT ${TpchGraph.gidSqlLabel} AS label, gid % 4294967296 AS key, auth, hub
       FROM (SELECT a.gid,
                    round(CASE WHEN n.asum > 0 THEN a.auth / n.asum ELSE 0.0 END, 8) AS auth,
                    round(CASE WHEN n.hsum > 0 THEN h.hub / n.hsum ELSE 0.0 END, 8) AS hub
             FROM afin a JOIN h$iters h USING (gid) CROSS JOIN norms n
             ORDER BY round(CASE WHEN n.asum > 0 THEN a.auth / n.asum ELSE 0.0 END, 8) DESC,
                      a.gid LIMIT 100)"""
  }

  /** Unrolled connected components (min-label propagation incl. self)
    * over the co-purchase graph, reported as the component-size profile.
    *
    * Self-checking: the unroll count is a measured-fixpoint + margin
    * calibration, so the oracle asserts (via a cardinality-affecting
    * WHERE — an unused projected assertion gets pruned by DuckDB's
    * optimizer and never evaluates) that the last round changed nothing.
    * A dataset needing more rounds then fails loudly as "rounds
    * exhausted" instead of surfacing as a spurious Spark-vs-oracle diff.
    */
  def ccSql(rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      s""",
       c$i AS MATERIALIZED (
         SELECT c.gid, least(c.comp, coalesce(m.nc, c.comp)) AS comp
         FROM c${i - 1} c LEFT JOIN (
           SELECT u.a, min(p.comp) AS nc
           FROM und u JOIN c${i - 1} p ON u.b = p.gid GROUP BY u.a) m
         ON c.gid = m.a)"""
    }.mkString
    s"""WITH $copurchase,
       c0 AS MATERIALIZED (SELECT gid, gid AS comp FROM pnodes)$steps,
       converged AS (
         SELECT 1 AS ok WHERE CASE WHEN (SELECT count(*) FROM
             ((SELECT * FROM c$rounds) EXCEPT (SELECT * FROM c${rounds - 1}))) > 0
           THEN error('cc oracle: $rounds unrolled rounds exhausted before fixpoint')
           ELSE true END),
       sizes AS (SELECT comp, count(*) AS size FROM c$rounds GROUP BY comp)
       SELECT size, count(*) AS n_components FROM sizes, converged GROUP BY size"""
  }

  /** Unrolled deterministic Luby MIS over the co-purchase graph — the
    * SQL mirror of [[graft.graph.Algorithms.maximalIndependentSet]],
    * round for round: u_i is the undecided set, each round admits
    * undecided nodes whose md5 priority is below every undecided
    * neighbor's, then removes them and their neighbors. Same
    * measured-fixpoint + margin discipline as [[ccSql]]: rounds past
    * the fixpoint are vacuous (empty undecided set selects nothing),
    * and the converged guard errors loudly if u_rounds is nonempty.
    */
  def misSql(rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      s""",
       s$i AS MATERIALIZED (
         SELECT u.gid FROM u${i - 1} u LEFT JOIN (
           SELECT e.a, min(p.pri) AS mp
           FROM und e JOIN u${i - 1} p ON e.b = p.gid GROUP BY e.a) m
         ON u.gid = m.a
         WHERE m.mp IS NULL OR u.pri < m.mp),
       u$i AS MATERIALIZED (
         SELECT u.gid, u.pri FROM u${i - 1} u
         WHERE u.gid NOT IN (SELECT gid FROM s$i)
           AND u.gid NOT IN (
             SELECT e.b FROM und e JOIN s$i s ON e.a = s.gid))"""
    }.mkString
    val misUnion = (1 to rounds)
      .map(i => s"SELECT gid, $i AS mis_round FROM s$i")
      .mkString(" UNION ALL ")
    s"""WITH $copurchase,
       u0 AS MATERIALIZED (
         SELECT gid, md5(CAST(gid AS VARCHAR)) AS pri FROM pnodes)$steps,
       converged AS (
         SELECT 1 AS ok WHERE CASE WHEN (SELECT count(*) FROM u$rounds) > 0
           THEN error('mis oracle: $rounds unrolled rounds exhausted before fixpoint')
           ELSE true END)
       SELECT m.gid, m.mis_round FROM ($misUnion) m, converged"""
  }

  /** Unrolled speculative greedy coloring over the heterogeneous gid
    * graph — the SQL mirror of
    * [[graft.graph.Algorithms.speculativeColoring]], round for round:
    * every uncolored node proposes the mex of its colored neighbors'
    * colors (list_filter over range(0, |colors|+1) — never empty by
    * pigeonhole), same-color conflicts lose to the smaller md5
    * priority, winners commit with the round index. Same
    * measured-fixpoint + margin + converged-guard discipline as
    * [[misSql]].
    */
  def coloringSql(rounds: Int, round1Palette: Boolean = false): String = {
    val steps = (1 to rounds).map { i =>
      // round 1 under the palette: tent = first 8 hex digits of the md5
      // priority as an integer, mod (deg + 1) — the exact mirror of the
      // Spark face's conv(substring(pri, 1, 8), 16, 10) % (deg + 1)
      // (cs is empty in round 1, so there is nothing to mex around)
      val tentExpr =
        if (round1Palette && i == 1)
          "CAST(('0x' || substring(u.pri, 1, 8)) AS BIGINT) % (u.deg + 1)"
        else
          """CASE WHEN n.cs IS NULL THEN CAST(0 AS BIGINT)
                     ELSE list_min(list_filter(range(0, len(n.cs) + 1),
                            x -> NOT list_contains(n.cs, x))) END"""
      s""",
       tent$i AS MATERIALIZED (
         SELECT u.gid, u.pri,
                $tentExpr AS tent
         FROM u${i - 1} u LEFT JOIN (
           SELECT e.a, list(DISTINCT c.color) AS cs
           FROM und e JOIN col${i - 1} c ON e.b = c.gid GROUP BY e.a) n
         ON u.gid = n.a),
       win$i AS MATERIALIZED (
         SELECT t.gid, t.tent FROM tent$i t
         WHERE NOT EXISTS (
           SELECT 1 FROM und e JOIN tent$i o ON e.b = o.gid
           WHERE e.a = t.gid AND o.tent = t.tent AND o.pri < t.pri)),
       col$i AS MATERIALIZED (
         SELECT gid, color, colored_round FROM col${i - 1}
         UNION ALL SELECT gid, tent, $i FROM win$i),
       u$i AS MATERIALIZED (
         SELECT u.gid, u.pri FROM u${i - 1} u
         WHERE u.gid NOT IN (SELECT gid FROM win$i))"""
    }.mkString
    s"""WITH ge AS (${TpchGraph.gidSqlEdges}),
       und AS MATERIALIZED (
         SELECT gsrc AS a, gdst AS b FROM ge WHERE gsrc <> gdst
         UNION
         SELECT gdst AS a, gsrc AS b FROM ge WHERE gsrc <> gdst),
       gnodes AS MATERIALIZED (${TpchGraph.gidSqlNodes}),
       u0 AS MATERIALIZED (
         SELECT g.gid, md5(CAST(g.gid AS VARCHAR)) AS pri,
                coalesce(d.deg, 0) AS deg
         FROM gnodes g LEFT JOIN (
           SELECT a, count(*) AS deg FROM und GROUP BY a) d
         ON g.gid = d.a),
       col0 AS MATERIALIZED (
         SELECT gid, CAST(0 AS BIGINT) AS color, 0 AS colored_round
         FROM gnodes LIMIT 0)$steps,
       converged AS (
         SELECT 1 AS ok WHERE CASE WHEN (SELECT count(*) FROM u$rounds) > 0
           THEN error('coloring oracle: $rounds unrolled rounds exhausted before fixpoint')
           ELSE true END)
       SELECT ${TpchGraph.gidSqlLabel} AS label, gid % 4294967296 AS key,
              color, CAST(colored_round AS BIGINT) AS colored_round
       FROM col$rounds, converged"""
  }

  /** Unrolled greedy maximal matching over the co-purchase graph — the
    * SQL mirror of [[graft.graph.Algorithms.maximalMatching]], round
    * for round: a live canonical edge is admitted when its md5
    * priority is the minimum at BOTH endpoints, matched endpoints
    * kill their incident edges. Same measured-fixpoint + margin +
    * converged-guard discipline as [[misSql]].
    */
  def matchingSql(rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      s""",
       nm$i AS (
         SELECT v, min(pri) AS mp FROM (
           SELECT a AS v, pri FROM l${i - 1}
           UNION ALL SELECT b AS v, pri FROM l${i - 1})
         GROUP BY v),
       s$i AS MATERIALIZED (
         SELECT l.a, l.b FROM l${i - 1} l
         JOIN nm$i x ON l.a = x.v AND l.pri = x.mp
         JOIN nm$i y ON l.b = y.v AND l.pri = y.mp),
       l$i AS MATERIALIZED (
         SELECT l.a, l.b, l.pri FROM l${i - 1} l
         WHERE l.a NOT IN (SELECT a FROM s$i UNION ALL SELECT b FROM s$i)
           AND l.b NOT IN (SELECT a FROM s$i UNION ALL SELECT b FROM s$i))"""
    }.mkString
    val matchedUnion = (1 to rounds)
      .map(i => s"SELECT a, b, $i AS match_round FROM s$i")
      .mkString(" UNION ALL ")
    s"""WITH $copurchase,
       l0 AS MATERIALIZED (
         SELECT a, b,
                md5(CAST(a AS VARCHAR) || '_' || CAST(b AS VARCHAR)) AS pri
         FROM ce)$steps,
       converged AS (
         SELECT 1 AS ok WHERE CASE WHEN (SELECT count(*) FROM l$rounds) > 0
           THEN error('matching oracle: $rounds unrolled rounds exhausted before fixpoint')
           ELSE true END)
       SELECT m.a AS part_a, m.b AS part_b, m.match_round
       FROM ($matchedUnion) m, converged"""
  }

  /** Spanning-forest summary invariants of the support-weighted
    * co-purchase subgraph (parts < 2000) — the checkable face of the
    * iterative Borůvka MSF ([[graft.graph.Algorithms.minimumSpanningForest]]):
    * full MSF edge selection has no SQL mirror, but ANY correct spanning
    * forest must satisfy (a) it spans: the forest's component structure
    * equals the graph's, and (b) it is acyclic: edge count =
    * n_nodes − n_components. The Spark side computes n_components FROM
    * THE FOREST it built; this oracle computes it from the full graph by
    * unrolled min-label propagation (same fixpoint-with-margin recipe as
    * [[ccSql]]) and derives the forest size — a cyclic or under-spanning
    * forest mismatches on either column. Edge WEIGHT exactness (the
    * min-total-weight property) is RandomizedAlgSpec's Kruskal
    * cross-check; it has no closed SQL form.
    */
  def msfSummarySql(rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      s""",
       c$i AS MATERIALIZED (
         SELECT c.gid, least(c.comp, coalesce(m.nc, c.comp)) AS comp
         FROM c${i - 1} c LEFT JOIN (
           SELECT u.a, min(p.comp) AS nc
           FROM und u JOIN c${i - 1} p ON u.b = p.gid GROUP BY u.a) m
         ON c.gid = m.a)"""
    }.mkString
    s"""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
                    WHERE l_partkey < 2000),
       ce AS MATERIALIZED (
         SELECT a.l_partkey AS a, b.l_partkey AS b
         FROM op a JOIN op b
         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         GROUP BY 1, 2),
       und AS MATERIALIZED (SELECT a, b FROM ce UNION ALL SELECT b AS a, a AS b FROM ce),
       pnodes AS (SELECT DISTINCT l_partkey AS gid FROM op),
       c0 AS MATERIALIZED (SELECT gid, gid AS comp FROM pnodes)$steps,
       converged AS (
         SELECT 1 AS ok WHERE CASE WHEN (SELECT count(*) FROM
             ((SELECT * FROM c$rounds) EXCEPT (SELECT * FROM c${rounds - 1}))) > 0
           THEN error('msf oracle: $rounds unrolled rounds exhausted before fixpoint')
           ELSE true END)
       SELECT count(*) AS n_nodes,
              count(DISTINCT comp) AS n_components,
              count(*) - count(DISTINCT comp) AS n_edges
       FROM c$rounds, converged"""
  }

  /** Unrolled synchronous label propagation with the
    * `mode(deterministic = true)` tie-break (most frequent neighbor
    * label, ties to the lowest), reported as the community-size profile.
    */
  def labelPropSql(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s""",
       l$i AS MATERIALIZED (
         SELECT l.gid, coalesce(b.newc, l.community) AS community
         FROM l${i - 1} l LEFT JOIN (
           SELECT a, community AS newc FROM (
             SELECT u.a, p.community,
                    row_number() OVER (PARTITION BY u.a
                      ORDER BY count(*) DESC, p.community) AS rn
             FROM und u JOIN l${i - 1} p ON u.b = p.gid
             GROUP BY u.a, p.community) t
           WHERE rn = 1) b ON l.gid = b.a)"""
    }.mkString
    s"""WITH $copurchase,
       l0 AS MATERIALIZED (SELECT gid, gid AS community FROM pnodes)$steps,
       sizes AS (SELECT community, count(*) AS size FROM l$iters GROUP BY community)
       SELECT size, count(*) AS n_communities FROM sizes GROUP BY size"""
  }

  /** Unrolled WEIGHTED label propagation over the SUPPORT-weighted
    * co-purchase graph (w = number of orders containing both parts) —
    * the SQL mirror of [[graft.graph.Algorithms.labelPropagationWeighted]]:
    * per round each node takes the label with the heaviest incident
    * vote mass, lowest label on a tie. Votes are integer sums, so the
    * two engines agree exactly in any evaluation order; the vote sums
    * are intermediates (never output columns), so DuckDB's HUGEINT
    * promotion is harmless here.
    */
  def labelPropWSql(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s""",
       l$i AS MATERIALIZED (
         SELECT l.gid, coalesce(b.newc, l.community) AS community
         FROM l${i - 1} l LEFT JOIN (
           SELECT a, community AS newc FROM (
             SELECT u.a, p.community,
                    row_number() OVER (PARTITION BY u.a
                      ORDER BY sum(u.w) DESC, p.community) AS rn
             FROM undw u JOIN l${i - 1} p ON u.b = p.gid
             GROUP BY u.a, p.community) t
           WHERE rn = 1) b ON l.gid = b.a)"""
    }.mkString
    s"""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       cew AS MATERIALIZED (
         SELECT a.l_partkey AS a, b.l_partkey AS b, count(*) AS w
         FROM op a JOIN op b
         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         GROUP BY 1, 2),
       undw AS MATERIALIZED (
         SELECT a, b, w FROM cew UNION ALL SELECT b AS a, a AS b, w FROM cew),
       pnodes AS MATERIALIZED (SELECT DISTINCT l_partkey AS gid FROM lineitem),
       l0 AS MATERIALIZED (SELECT gid, gid AS community FROM pnodes)$steps,
       sizes AS (SELECT community, count(*) AS size FROM l$iters GROUP BY community)
       SELECT size, count(*) AS n_communities FROM sizes GROUP BY size"""
  }

  /** WEIGHTED modularity over the weighted label-prop partition — the
    * SQL mirror of [[graft.queries.GraphOps.gModularityW]]: the same
    * unrolled weighted-majority rounds as [[labelPropWSql]], then the
    * exact integer numerator Σ_c (4·W·W_c − S_c²) divided once by 4W².
    */
  def modularityWSql(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s""",
       l$i AS MATERIALIZED (
         SELECT l.gid, coalesce(b.newc, l.community) AS community
         FROM l${i - 1} l LEFT JOIN (
           SELECT a, community AS newc FROM (
             SELECT u.a, p.community,
                    row_number() OVER (PARTITION BY u.a
                      ORDER BY sum(u.w) DESC, p.community) AS rn
             FROM undw u JOIN l${i - 1} p ON u.b = p.gid
             GROUP BY u.a, p.community) t
           WHERE rn = 1) b ON l.gid = b.a)"""
    }.mkString
    s"""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       cew AS MATERIALIZED (
         SELECT a.l_partkey AS a, b.l_partkey AS b, count(*) AS w
         FROM op a JOIN op b
         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         GROUP BY 1, 2),
       undw AS MATERIALIZED (
         SELECT a, b, w FROM cew UNION ALL SELECT b AS a, a AS b, w FROM cew),
       pnodes AS MATERIALIZED (SELECT DISTINCT l_partkey AS gid FROM lineitem),
       l0 AS MATERIALIZED (SELECT gid, gid AS community FROM pnodes)$steps,
       intra AS (
         SELECT la.community AS c, CAST(sum(e.w) AS BIGINT) AS winc
         FROM cew e JOIN l$iters la ON e.a = la.gid
                    JOIN l$iters lb ON e.b = lb.gid
         WHERE la.community = lb.community GROUP BY 1),
       sdeg AS (
         SELECT l.community AS c, CAST(sum(d.sd) AS BIGINT) AS sc
         FROM (SELECT a AS gid, CAST(sum(w) AS BIGINT) AS sd
               FROM undw GROUP BY 1) d
         JOIN l$iters l ON d.gid = l.gid GROUP BY 1),
       s AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM cew),
       nc AS (SELECT count(DISTINCT community) AS n_communities FROM l$iters)
       SELECT nc.n_communities,
              round(CAST(sum(4 * s.tw * coalesce(intra.winc, 0) -
                             sdeg.sc * sdeg.sc) AS BIGINT)
                    / (4.0 * s.tw * s.tw), 6) AS modularity_w
       FROM sdeg LEFT JOIN intra ON sdeg.c = intra.c, s, nc
       GROUP BY nc.n_communities, s.tw"""
  }

  /** Modularity of the label-propagation partition: the same unrolled
    * majority-vote rounds as [[labelPropSql]], then
    * Q = Σ_c (e_c/m − (D_c/2m)²) over the final labels — exact integer
    * counts divided at the very end, mirroring the Spark plan.
    */
  def modularitySql(iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s""",
       l$i AS MATERIALIZED (
         SELECT l.gid, coalesce(b.newc, l.community) AS community
         FROM l${i - 1} l LEFT JOIN (
           SELECT a, community AS newc FROM (
             SELECT u.a, p.community,
                    row_number() OVER (PARTITION BY u.a
                      ORDER BY count(*) DESC, p.community) AS rn
             FROM und u JOIN l${i - 1} p ON u.b = p.gid
             GROUP BY u.a, p.community) t
           WHERE rn = 1) b ON l.gid = b.a)"""
    }.mkString
    s"""WITH $copurchase,
       l0 AS MATERIALIZED (SELECT gid, gid AS community FROM pnodes)$steps,
       intra AS (
         SELECT la.community AS c, count(*) AS ec
         FROM ce e JOIN l$iters la ON e.a = la.gid
                   JOIN l$iters lb ON e.b = lb.gid
         WHERE la.community = lb.community GROUP BY 1),
       dc AS (
         SELECT l.community AS c, sum(d.d) AS dc
         FROM (SELECT a AS gid, count(*) AS d FROM und GROUP BY 1) d
         JOIN l$iters l ON d.gid = l.gid GROUP BY 1),
       s AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM ce),
       nc AS (SELECT count(DISTINCT community) AS n_communities FROM l$iters)
       SELECT nc.n_communities,
              round(sum(coalesce(intra.ec, 0) / s.m -
                        pow(dc.dc / (2.0 * s.m), 2)), 6) AS modularity
       FROM dc LEFT JOIN intra ON dc.c = intra.c, s, nc
       GROUP BY nc.n_communities"""
  }

  /** Unrolled derandomized random walks ([[graft.graph.Walks]]): step i
    * keeps, per walk, the neighbor with the smallest
    * md5(walk_id:i:neighbor) (neighbor id as tiebreak, matching the
    * struct min), appending it to the path; dead ends carry the path
    * unchanged.
    */
  def randomWalksSql(steps: Int): String = {
    val stepCtes = (1 to steps).map { i =>
      s""",
       w$i AS MATERIALIZED (
         SELECT w.walk_id,
                coalesce(p.nb, w.cur) AS cur,
                CASE WHEN p.nb IS NULL THEN w.path
                     ELSE w.path || '->' || CAST(p.nb AS VARCHAR) END AS path
         FROM w${i - 1} w LEFT JOIN (
           SELECT walk_id, nb FROM (
             SELECT w.walk_id, u.b AS nb,
                    row_number() OVER (PARTITION BY w.walk_id
                      ORDER BY md5(concat_ws(':', w.walk_id, $i, u.b)), u.b) AS rn
             FROM w${i - 1} w JOIN und u ON w.cur = u.a) t
           WHERE rn = 1) p ON w.walk_id = p.walk_id)"""
    }.mkString
    s"""WITH $copurchase,
       w0 AS MATERIALIZED (
         SELECT gid AS walk_id, gid AS cur, CAST(gid AS VARCHAR) AS path
         FROM pnodes)$stepCtes
       SELECT walk_id, path FROM w$steps"""
  }

  /** Unrolled node2vec-biased walks ([[graft.graph.Walks.node2vecWalks]]
    * mirror): per step the same md5-uniform, the same A-ES key
    * pow(u, 1/α) rounded to 9 dp, the same (key DESC, b DESC) argmax,
    * with α from the p/q rule against the PREVIOUS node (membership
    * via a left join on the undirected edge set; a NULL prev — step 1 —
    * falls through to the 1/q branch on both sides, a constant α that
    * cannot change an argmax).
    */
  def node2vecSql(steps: Int, p: Double, q: Double): String = {
    val stepCtes = (1 to steps).map { i =>
      s""",
       w$i AS MATERIALIZED (
         SELECT w.walk_id,
                CASE WHEN pk.nb IS NOT NULL THEN w.cur ELSE w.prev END AS prev,
                coalesce(pk.nb, w.cur) AS cur,
                CASE WHEN pk.nb IS NULL THEN w.path
                     ELSE w.path || '->' || CAST(pk.nb AS VARCHAR) END AS path
         FROM w${i - 1} w LEFT JOIN (
           SELECT walk_id, nb FROM (
             SELECT w.walk_id, u.b AS nb,
                    row_number() OVER (PARTITION BY w.walk_id ORDER BY
                      round(pow(
                        CAST(CAST('0x' || substr(md5(
                          concat_ws(':', w.walk_id, $i, u.b)), 1, 13) AS BIGINT)
                          AS DOUBLE) / 4503599627370496.0,
                        1.0 / (CASE WHEN u.b = w.prev THEN ${1.0 / p}
                                    WHEN m.a IS NOT NULL THEN 1.0
                                    ELSE ${1.0 / q} END)), 9) DESC, u.b DESC)
                      AS rn
             FROM w${i - 1} w JOIN und u ON w.cur = u.a
             LEFT JOIN und m ON m.a = w.prev AND m.b = u.b) t
           WHERE rn = 1) pk ON w.walk_id = pk.walk_id)"""
    }.mkString
    s"""WITH $copurchase,
       w0 AS MATERIALIZED (
         SELECT gid AS walk_id, CAST(NULL AS BIGINT) AS prev, gid AS cur,
                CAST(gid AS VARCHAR) AS path
         FROM pnodes)$stepCtes
       SELECT walk_id, path FROM w$steps"""
  }

  /** Unrolled k-core peeling over the co-purchase graph: survivors of
    * round i are nodes with degree ≥ k in the subgraph induced by round
    * i-1's survivors. Reports the member count.
    *
    * Self-checking like [[ccSql]]: survivor sets only shrink, so count
    * equality between the last two rounds IS set equality — asserted in
    * a cardinality-affecting WHERE so a too-small unroll fails loudly.
    */
  def kcoreSql(k: Int, rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      s""",
       s$i AS MATERIALIZED (
         SELECT u.a AS gid FROM und u
         JOIN s${i - 1} x ON u.a = x.gid
         JOIN s${i - 1} y ON u.b = y.gid
         GROUP BY u.a HAVING count(*) >= $k)"""
    }.mkString
    s"""WITH $copurchase,
       s0 AS MATERIALIZED (SELECT DISTINCT a AS gid FROM und)$steps,
       converged AS (
         SELECT 1 AS ok WHERE CASE WHEN (SELECT count(*) FROM s$rounds) <>
             (SELECT count(*) FROM s${rounds - 1})
           THEN error('kcore oracle: $rounds unrolled rounds exhausted before fixpoint')
           ELSE true END)
       SELECT count(*) AS core_size FROM s$rounds, converged"""
  }

  /** Unrolled WEIGHTED k-core peeling over the support-weighted
    * co-purchase graph — the SQL mirror of
    * [[graft.graph.Algorithms.kCoreWeighted]]: survivors of round i are
    * nodes whose incident support sum within round i-1's survivor
    * subgraph is ≥ minWeight. Integer weights keep every peel exact;
    * the weighted-degree sums are HAVING intermediates (never output
    * columns), so DuckDB's HUGEINT promotion is harmless. Same
    * shrink-only self-check as [[kcoreSql]].
    */
  def kcoreWSql(minWeight: Long, rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      s""",
       s$i AS MATERIALIZED (
         SELECT u.a AS gid FROM undw u
         JOIN s${i - 1} x ON u.a = x.gid
         JOIN s${i - 1} y ON u.b = y.gid
         GROUP BY u.a HAVING sum(u.w) >= $minWeight)"""
    }.mkString
    s"""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       cew AS MATERIALIZED (
         SELECT a.l_partkey AS a, b.l_partkey AS b, count(*) AS w
         FROM op a JOIN op b
         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         GROUP BY 1, 2),
       undw AS MATERIALIZED (
         SELECT a, b, w FROM cew UNION ALL SELECT b AS a, a AS b, w FROM cew),
       s0 AS MATERIALIZED (SELECT DISTINCT a AS gid FROM undw)$steps,
       converged AS (
         SELECT 1 AS ok WHERE CASE WHEN (SELECT count(*) FROM s$rounds) <>
             (SELECT count(*) FROM s${rounds - 1})
           THEN error('kcoreW oracle: $rounds unrolled rounds exhausted before fixpoint')
           ELSE true END)
       SELECT count(*) AS core_size FROM s$rounds, converged"""
  }

  /** Unrolled k-truss peeling over the bounded co-purchase graph — the
    * SQL mirror of [[graft.graph.Algorithms.kTruss]]: per round,
    * enumerate triangles on the surviving canonical edge set (x<y<z via
    * the two-hop join), credit each triangle to its three edges, keep
    * edges with support ≥ k−2. Same self-checking convergence assertion
    * as [[kcoreSql]] (edge sets only shrink, so count equality between
    * the final two rounds is set equality).
    */
  def trussSql(k: Int, rounds: Int, partBound: Int): String = {
    val minSup = k - 2
    val steps = (1 to rounds).map { i =>
      s""",
       tri$i AS (
         SELECT e1.a AS x, e1.b AS y, e2.b AS z
         FROM t${i - 1} e1
         JOIN t${i - 1} e2 ON e2.a = e1.a AND e2.b > e1.b
         JOIN t${i - 1} e3 ON e3.a = e1.b AND e3.b = e2.b),
       t$i AS MATERIALIZED (
         SELECT a, b FROM (
           SELECT a, b, count(*) AS s FROM (
             SELECT x AS a, y AS b FROM tri$i
             UNION ALL SELECT x AS a, z AS b FROM tri$i
             UNION ALL SELECT y AS a, z AS b FROM tri$i)
           GROUP BY 1, 2)
         WHERE s >= $minSup)"""
    }.mkString
    s"""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
                    WHERE l_partkey < $partBound),
       t0 AS MATERIALIZED (
         SELECT a.l_partkey AS a, b.l_partkey AS b
         FROM op a JOIN op b
         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         GROUP BY 1, 2)$steps,
       converged AS (
         SELECT 1 AS ok WHERE CASE WHEN (SELECT count(*) FROM t$rounds) <>
             (SELECT count(*) FROM t${rounds - 1})
           THEN error('truss oracle: $rounds unrolled rounds exhausted before fixpoint')
           ELSE true END)
       SELECT a AS part_a, b AS part_b FROM t$rounds, converged"""
  }
}
