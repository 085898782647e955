package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def comps(edges: Seq[(Long, Long)], maxRounds: Int = 50) =
    Clustering.connectedComponents(
        edges.toDF("id_a", "id_b"), "id_a", "id_b", maxRounds)
      .as[(Long, Long)].collect().toMap

  test("path + clique + isolated edge resolve to min-id components") {
    val got = comps(Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), // path
      (10L, 11L), (11L, 12L), (10L, 12L),     // triangle
      (20L, 21L)))                            // isolated edge
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("duplicate and reversed edges do not change the answer") {
    val got = comps(Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 2L), (2L, 3L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("pointer jumping: a 64-node chain converges in O(log n) rounds") {
    // plain min-label propagation moves the label one hop per round and
    // would need 63 rounds end-to-end; with the hop step the reachable
    // distance grows multiplicatively, so 10 rounds must suffice —
    // convergence failure throws
    val chain = (0L until 63L).map(i => (i, i + 1))
    val got = comps(chain, maxRounds = 10)
    assert(got.size == 64 && got.values.forall(_ == 0L))
  }

  test("non-convergence throws instead of returning partial labels") {
    val chain = (0L until 63L).map(i => (i, i + 1))
    intercept[IllegalStateException] {
      comps(chain, maxRounds = 2)
    }
  }

  test("empty edge set: empty components; labelCorpus yields all singletons") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Clustering.connectedComponents(empty, "id_a", "id_b").isEmpty)
    val corpus = Seq(1L, 2L).toDF("doc_id")
    val got = Clustering.labelCorpus(corpus, "doc_id", empty, "id_a", "id_b")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got == Set((1L, 1L, true), (2L, 2L, true)))
  }

  test("labelCorpus labels pair members and singletons, flags reps") {
    val corpus = Seq(1L, 2L, 3L, 7L, 9L).toDF("doc_id")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val got = Clustering.labelCorpus(corpus, "doc_id", edges, "id_a", "id_b")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got == Set(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (7L, 7L, true), (9L, 9L, true)))
  }

  test("canonical election: longest text wins its cluster, doc_id breaks ties") {
    // cluster {1,2,3} linked by edges; doc 2 is longest; docs 4,5 are
    // singletons; 6 and 7 tie on length -> lower doc_id wins
    val docs = Seq(
      (1L, "aa"), (2L, "aaaa"), (3L, "a"),
      (4L, "bbb"), (5L, "c"), (6L, "dd"), (7L, "dd")
    ).map { case (id, t) => (id, t, t.length.toLong) }
      .toDF("doc_id", "text", "n_chars")
    val edges = Seq((1L, 2L), (2L, 3L), (6L, 7L)).toDF("id_a", "id_b")
    val labeled = Clustering.labelCorpus(docs, "doc_id", edges, "id_a", "id_b")
    val got = labeled
      .join(docs.select($"doc_id", $"n_chars"), "doc_id")
      .groupBy($"component")
      .agg(count(lit(1)).as("cluster_size"),
           min(struct((-$"n_chars").as("neg"), $"doc_id".as("id"))).as("best"))
      .select($"component", $"best.id".as("canonical_id"), $"cluster_size")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == ((2L, 3L)))   // doc 2 (len 4) beats 1 and 3
    assert(got(4L) == ((4L, 1L)))
    assert(got(5L) == ((5L, 1L)))
    assert(got(6L) == ((6L, 2L)))   // 6 and 7 tie at len 2 -> min id
  }
}
