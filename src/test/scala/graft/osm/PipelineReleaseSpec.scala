package graft.osm

import graft.SparkSpec
import graft.ops.Stage
import graft.queries.OsmQueries

/** The notebook lifecycle contract (Stage LIFECYCLE): a long-lived session
  * can drop every staged OSM relation with `release()`, and the pipeline
  * keeps working afterwards — the next touched relation re-stages from the
  * XML rather than silently recomputing uncached per action. */
class PipelineReleaseSpec extends SparkSpec {

  test("release() drops staged relations; pipeline rebuilds on touch") {
    val p = OsmPipeline(spark, OsmQueries.OsmPath, OsmQueries.PsiPath)
    val n1 = p.nodes.count()
    val h1 = p.updateHistory.count()
    assert(Stage.stagedCount(spark) >= 2)

    p.release()
    assert(Stage.stagedCount(spark) == 0)

    // rebuild-on-touch: the same pipeline instance re-stages and the
    // relation content is unchanged
    assert(p.nodes.count() == n1)
    assert(Stage.stagedCount(spark) >= 1)
    assert(p.updateHistory.count() == h1)

    p.release()
    assert(Stage.stagedCount(spark) == 0)
  }
}
