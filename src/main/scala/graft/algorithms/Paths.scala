package graft.algorithms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Path enumeration (reference: src/algorithms/traversal.rs:239
  * all_simple_paths, :183 variable_length_path — the reference DFS-walks
  * the adjacency list; here each depth level is one hash join carrying
  * the path as an array column, and simplicity is enforced with
  * array_contains).
  *
  * Scale notes: the frontier is rows × path-arrays — bounded by the
  * simple-path count, which the maxLen cap controls. Each level shuffles
  * only on the join key; the destination check drains finished paths out
  * of the frontier so they stop expanding.
  */
object Paths {

  /** All simple paths src→dst with at most maxLen edges, dst only as the
    * final node. Returns one row per path: "id->id->…->id". */
  def simplePaths(edges: DataFrame, srcId: Long, dstId: Long, maxLen: Int): DataFrame = {
    require(maxLen >= 1 && maxLen <= 10, "bounded enumeration only")
    val ss = edges.sparkSession
    val e = edges.select(col("src"), col("dst"))
    var active = ss.range(1)
      .select(lit(srcId).as("cur"), array(lit(srcId)).as("path"))
    var found: Option[DataFrame] = None
    for (_ <- 1 to maxLen) {
      val step = active.as("p").join(e.as("e"), col("p.cur") === col("e.src"))
        .filter(!array_contains(col("p.path"), col("e.dst")))
        .select(col("e.dst").as("cur"),
          concat(col("p.path"), array(col("e.dst"))).as("path"))
        .localCheckpoint()
      val hits = step.filter(col("cur") === dstId)
      found = Some(found.fold(hits)(_ unionByName hits))
      active = step.filter(col("cur") =!= dstId)
    }
    found.get.select(
      concat_ws("->", expr("transform(path, x -> CAST(x AS STRING))")).as("path"))
  }

  /** Does any path src→dst of ≤ maxLen edges exist
    * (reference shortest_path.rs:314 has_path)? */
  def hasPath(edges: DataFrame, srcId: Long, dstId: Long, maxLen: Int): Boolean = {
    val ss = edges.sparkSession
    val seed = ss.range(1).select(lit(srcId).as("id"))
    !Traversal.bfsDistances(edges, seed, maxLen)
      .filter(col("id") === dstId).isEmpty
  }
}
