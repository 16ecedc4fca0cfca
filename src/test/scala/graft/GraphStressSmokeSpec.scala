package graft

import graft.tools.GraphStress
import graft.wikidata.WikidataCatalog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CI smoke arm of the tools.GraphStress scaling harness (the r7
  * verdict's round-8 item #7): the manual tool measured that CC round
  * counts are STRUCTURE-determined (flat from 1x to 10000x disjoint)
  * and that large-star/small-star beats min-label propagation on
  * high-diameter graphs (chained wiring). Those two facts are the
  * engine's 100 TB posture for the graph family — this spec asserts
  * them on the exact kernels + the exact replication harness at a
  * ~15 s scale, so a future plan regression that changes convergence
  * structure fails loudly in sbt test instead of silently in a manual
  * tool.
  */
class GraphStressSmokeSpec extends AnyFunSuite {
  import TestSpark._

  private def ccRounds(sym: DataFrame): (Int, Int, Long, Long) = {
    val verts = sym.select(col("a").as("id")).distinct().localCheckpoint(true)
    val (ml, mlRounds) = WikidataCatalog.ccMinLabelKernel(sym, verts, maxRounds = 4096)
    val mlComponents = ml.select("comp").distinct().count()
    GraftCache.clear()
    val (lss, lssRounds) = WikidataCatalog.ccLssKernel(sym, verts, maxRounds = 4096)
    val lssComponents = lss.select("comp").distinct().count()
    GraftCache.clear()
    (mlRounds, lssRounds, mlComponents, lssComponents)
  }

  test("CC rounds are structure-determined: 100x disjoint replication keeps 1x round counts") {
    GraftCache.clear()
    val (sym0, _) = GraphStress.baseSymmetric(spark, sf)
    val (ml1, lss1, mlC1, lssC1) = ccRounds(sym0)
    assert(mlC1 === lssC1, "the two kernels must agree on component count at 1x")
    val (ml100, lss100, mlC100, lssC100) = ccRounds(
      GraphStress.replicate(sym0, 100).localCheckpoint(true))
    info(s"rounds 1x ml=$ml1 lss=$lss1; 100x ml=$ml100 lss=$lss100; components 1x=$mlC1 100x=$mlC100")
    assert(mlC100 === 100 * mlC1, "disjoint replicas must multiply component count")
    assert(lssC100 === mlC100)
    assert(ml100 === ml1, s"min-label rounds grew with SIZE (not structure): $ml1 -> $ml100")
    assert(lss100 === lss1, s"LSS rounds grew with SIZE (not structure): $lss1 -> $lss100")
  }

  test("LSS is the high-diameter path: fewer rounds than min-label on the 10x chain") {
    GraftCache.clear()
    val (sym0, minVertex) = GraphStress.baseSymmetric(spark, sf)
    val (ml1, _, c1, _) = ccRounds(sym0)
    val (mlC, lssC, mlComp, lssComp) = ccRounds(
      GraphStress.chain(sym0, 10, minVertex).localCheckpoint(true))
    info(s"chained 10x: ml=$mlC lss=$lssC rounds, components=$mlComp")
    // the bridge edges merge the 10 copies of the min-vertex component
    // into one; every other component replicates untouched
    assert(mlComp === 10 * c1 - 9, "chain wiring must merge exactly the bridged replicas")
    assert(lssComp === mlComp)
    assert(mlC > ml1, "the chain must actually grow the diameter min-label walks")
    assert(lssC < mlC, s"LSS must beat min-label on the high-diameter chain: lss=$lssC ml=$mlC")
  }
}
