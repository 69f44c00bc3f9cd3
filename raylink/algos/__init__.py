"""Algorithm library — Ray-Data-native re-expression of the reference's
sample-hama workload (SURVEY.md §2.4)."""

from raylink.algos.pagerank import (  # noqa: F401
    PageRank,
    SeededPageRank,
    pagerank,
    seeded_pagerank,
)
from raylink.algos.lpa import MinLabelLPA, label_propagation  # noqa: F401
from raylink.algos.cc import connected_components  # noqa: F401
from raylink.algos.sssp import SSSP, sssp  # noqa: F401
from raylink.algos.kcore import KCore, coreness, kcore  # noqa: F401
from raylink.algos.kmeans import KMeansCluster, graph_kmeans  # noqa: F401
from raylink.algos.kcore_montresor import KCoreMontresor, coreness_montresor  # noqa: F401
from raylink.algos.subgraphrank import SubgraphRank, subgraph_rank  # noqa: F401
from raylink.algos.spanning import BFSForest, spanning_forest  # noqa: F401
from raylink.algos.triangles import triangle_count  # noqa: F401
from raylink.algos.hits import HITS, hits  # noqa: F401
from raylink.algos.salsa import SALSA, salsa  # noqa: F401
from raylink.algos.scc import scc  # noqa: F401
from raylink.algos.anf import hyperanf  # noqa: F401
from raylink.algos.densest import densest_subgraph  # noqa: F401
from raylink.algos.dag import condensation_layers, longest_path_layers  # noqa: F401
from raylink.algos.fastrp import FastRP, fastrp  # noqa: F401
from raylink.algos.mst import minimum_spanning_forest  # noqa: F401
from raylink.algos.mis import maximal_independent_set  # noqa: F401
from raylink.algos.coloring import jp_coloring  # noqa: F401
from raylink.algos.matching import maximal_matching  # noqa: F401
from raylink.algos.wl import wl_classes  # noqa: F401
from raylink.algos.centrality import (  # noqa: F401
    betweenness_sampled,
    harmonic_centrality,
)
from raylink.algos.walks import node2vec_walks, random_walks  # noqa: F401
from raylink.algos.eigenvector import (  # noqa: F401
    EigenvectorPower,
    eigenvector_centrality,
)
