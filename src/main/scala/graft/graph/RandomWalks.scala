package graft.graph

import graft.core.Hashing
import graft.functions.{Hash64, Mix64}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Seeded random-walk corpus generation over the KG — the training-data
  * operator a DeepWalk/node2vec-style embedding pipeline runs between
  * graph assembly and skip-gram training: `walksPerNode` walks of
  * `walkLen` steps from every node of the undirected graph, emitted as a
  * flat (start, walk, step, node) table (step 0 = the start node).
  *
  * Determinism contract (same discipline as [[NegativeSampling]]): the
  * next-hop draw at step s is a pure function of
  * `(seed, start|walk|s|current)` — `hash2(seed, hashString(key))`
  * indexes into the SORTED per-node neighbor array — so the corpus is
  * identical under any partitioning, core count, or re-run, and the
  * oracle's sequential replica re-derives it exactly. Because the graph
  * is undirected, every reached node has ≥1 neighbor (its back-edge), so
  * no walk ever strands: output is exactly
  * `nodes × walksPerNode × (walkLen + 1)` rows.
  *
  * Scale shape: the adjacency table is one edge-sized groupBy with
  * `collect_set` capped at `maxDegree` (deterministic first-k of the
  * sorted list — the hub-guard discipline of the dedup family), then
  * each step is ONE broadcast hash join of the walk frontier against it
  * plus codegen'd hash arithmetic ([[Hash64]]/[[Mix64]] — no UDF
  * boundary). For ontology-scale graphs (this KG: the concept
  * vocabulary) the adjacency broadcasts outright; `walkLen` is bounded,
  * so the plan is constant-depth. The frontier never shuffles.
  */
object RandomWalks {

  /** The next-hop draw kernel, shared verbatim with the Fixtures replica
    * (`Hashing.pick` is the same floor-mod the plan's `pmod` computes).
    */
  def stepDraw(seed: Long, start: String, walk: Int, step: Int, cur: String, n: Int): Int =
    Hashing.pick(Hashing.hash2(seed, Hashing.hashString(s"$start|$walk|$step|$cur")), n)

  /** @param edges        one row per edge (either orientation; self-loops
    *                      dropped; multi-edges collapse via the neighbor set)
    * @param walksPerNode  walks started at every node (walk ∈ [0, walksPerNode))
    * @param walkLen       steps per walk (output has walkLen + 1 rows per walk)
    * @param maxDegree     deterministic cap on each node's neighbor list
    * @return (start, walk, step, node)
    */
  def walks(
      edges: DataFrame,
      walksPerNode: Int,
      walkLen: Int,
      seed: Long,
      srcCol: String = "src",
      dstCol: String = "dst",
      maxDegree: Int = 1024): DataFrame = {
    require(walksPerNode > 0, "walksPerNode must be positive")
    require(walkLen >= 0, "walkLen must be non-negative")
    val src = col(srcCol)
    val dst = col(dstCol)
    val bi = edges.select(src.as("node"), dst.as("nbr"))
      .unionByName(edges.select(dst.as("node"), src.as("nbr")))
      .filter(col("node") =!= col("nbr"))
    // adjacency: sorted distinct neighbors, capped — vocabulary-bounded
    // for ontology graphs; localCheckpoint truncates the (possibly deep)
    // edge lineage so each step's broadcast reuses the materialized table
    val adj = bi.groupBy("node")
      .agg(slice(sort_array(collect_set(col("nbr"))), 1, maxDegree).as("nbrs"))
      .localCheckpoint()

    var cur = adj.select(
      col("node").as("start"),
      explode(array((0 until walksPerNode).map(lit): _*)).as("walk"))
      .select(col("start"), col("walk"), lit(0).as("step"), col("start").as("node"))
    var acc = cur
    for (step <- 1 to walkLen) {
      // hash2(seed, h) = mix64(mix64(seed) ^ h): seed half folds to a
      // plan literal, data half is codegen'd — same kernel as stepDraw
      val key = concat_ws("|", col("start"), col("walk"), lit(step), col("node"))
      val h = Mix64.mix64(lit(Hashing.mix64(seed)).bitwiseXOR(Hash64.hash64(key)))
      cur = cur.join(broadcast(adj), Seq("node"))
        .select(col("start"), col("walk"), lit(step).as("step"),
          element_at(col("nbrs"), (pmod(h, size(col("nbrs"))) + 1).cast("int")).as("node"))
      acc = acc.unionByName(cur)
    }
    acc
  }

  /** Skip-gram training pairs from a walk corpus — the step between
    * [[walks]] and embedding training in a DeepWalk/node2vec pipeline:
    * every (center, context) node pair whose positions within one walk
    * differ by 1..`window`, with corpus-wide multiplicity `n`.
    *
    * Scale shape: one self-equi-join on the (start, walk) walk id — the
    * per-key group is `walkLen + 1` rows, so the join fan-out per walk is
    * bounded by (walkLen+1)·2·window regardless of graph size — then a
    * partial-agg groupBy on the vocabulary-bounded (center, context)
    * domain. Nothing quadratic in corpus size, no window functions.
    *
    * @param walks (start, walk, step, node) from [[walks]]
    */
  def skipGramPairs(walks: DataFrame, window: Int): DataFrame = {
    require(window > 0, "window must be positive")
    val a = walks.select(
      col("start"), col("walk"), col("step").as("step_c"), col("node").as("center"))
    val b = walks.select(
      col("start"), col("walk"), col("step").as("step_x"), col("node").as("context"))
    a.join(b, Seq("start", "walk"))
      .filter(abs(col("step_c") - col("step_x")).between(1, window))
      .groupBy("center", "context")
      .agg(count(lit(1)).as("n"))
  }
}
