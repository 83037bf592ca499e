from graphit_spark.kernels.pagerank import (
    pagerank,
    pagerank_delta,
    personalized_pagerank,
    personalized_pagerank_batch,
    trustrank,
    weighted_pagerank,
)
from graphit_spark.kernels.components import connected_components
from graphit_spark.kernels.scc import strongly_connected_components
from graphit_spark.kernels.labelprop import (
    label_propagation,
    label_spreading,
    weighted_label_propagation,
)
from graphit_spark.kernels.louvain import louvain_communities, louvain_move
from graphit_spark.kernels.wl import wl_refinement
from graphit_spark.kernels.simrank import simrank
from graphit_spark.kernels.bridges import (
    articulation_points,
    biconnected_components,
    bridges,
)
from graphit_spark.kernels.triangles import (
    scan_statistics,
    triangle_count,
    triangle_count_approx,
    triangle_count_per_vertex,
    worth_relabelling,
)
from graphit_spark.kernels.paths import bfs, sssp
from graphit_spark.kernels.kcore import k_core, core_decomposition
from graphit_spark.kernels.truss import k_truss
from graphit_spark.kernels.bc import betweenness_centrality
from graphit_spark.kernels.cf import collaborative_filtering
from graphit_spark.kernels.centrality import (
    closeness_centrality,
    closeness_score,
    eigenvector_centrality,
    katz_centrality,
)
from graphit_spark.kernels.delta_stepping import sssp_delta_stepping
from graphit_spark.kernels.fused import fused_pr_eigenvector, fused_trust_spam
from graphit_spark.kernels.influence import influence_max
from graphit_spark.kernels.hyperball import (
    effective_diameter,
    hyperball_harmonic,
    neighborhood_function,
)
from graphit_spark.kernels.hits import hits
from graphit_spark.kernels.landmarks import landmark_distances
from graphit_spark.kernels.cocite import butterfly_count, cocitation
from graphit_spark.kernels.densest import densest_subgraph
from graphit_spark.kernels.ego import ego_subgraph, sample_fanout
from graphit_spark.kernels.linkpred import link_prediction
from graphit_spark.kernels.redirects import resolve_redirects
from graphit_spark.kernels.salsa import salsa
from graphit_spark.kernels.astar import astar, ppsp
from graphit_spark.kernels.bowtie import bowtie_classes
from graphit_spark.kernels.coloring import greedy_coloring
from graphit_spark.kernels.mis import maximal_independent_set
from graphit_spark.kernels.matching import maximal_matching
from graphit_spark.kernels.mst import minimum_spanning_forest
from graphit_spark.kernels.setcover import set_cover
from graphit_spark.kernels.pprpush import approximate_ppr_push
from graphit_spark.kernels.spectral import spectral_bisection, spectral_partition
from graphit_spark.kernels.sweepcut import sweep_cut
from graphit_spark.kernels.walks import (
    build_alias_tables,
    montecarlo_pagerank,
    build_node2vec_alias_tables,
    node2vec_walks,
    node2vec_walks_alias,
    random_in_neighbor,
    random_out_neighbor,
    random_walks,
    random_walks_alias,
    weighted_random_walks,
)

__all__ = [
    "ppsp",
    "bowtie_classes",
    "louvain_move",
    "louvain_communities",
    "k_truss",
    "hits",
    "link_prediction",
    "salsa",
    "strongly_connected_components",
    "approximate_ppr_push",
    "spectral_bisection",
    "spectral_partition",
    "sweep_cut",
    "random_in_neighbor",
    "random_out_neighbor",
    "random_walks",
    "random_walks_alias",
    "montecarlo_pagerank",
    "scan_statistics",
    "bridges",
    "biconnected_components",
    "articulation_points",
    "build_alias_tables",
    "weighted_random_walks",
    "node2vec_walks",
    "node2vec_walks_alias",
    "build_node2vec_alias_tables",
    "astar",
    "maximal_independent_set",
    "maximal_matching",
    "minimum_spanning_forest",
    "set_cover",
    "k_core",
    "core_decomposition",
    "betweenness_centrality",
    "collaborative_filtering",
    "closeness_centrality",
    "closeness_score",
    "eigenvector_centrality",
    "katz_centrality",
    "resolve_redirects",
    "fused_pr_eigenvector",
    "fused_trust_spam",
    "greedy_coloring",
    "effective_diameter",
    "influence_max",
    "hyperball_harmonic",
    "neighborhood_function",
    "pagerank",
    "pagerank_delta",
    "personalized_pagerank",
    "personalized_pagerank_batch",
    "trustrank",
    "weighted_pagerank",
    "connected_components",
    "label_propagation",
    "label_spreading",
    "wl_refinement",
    "weighted_label_propagation",
    "simrank",
    "triangle_count",
    "triangle_count_approx",
    "triangle_count_per_vertex",
    "worth_relabelling",
    "bfs",
    "butterfly_count",
    "cocitation",
    "densest_subgraph",
    "ego_subgraph",
    "sample_fanout",
    "landmark_distances",
    "sssp",
    "sssp_delta_stepping",
]
