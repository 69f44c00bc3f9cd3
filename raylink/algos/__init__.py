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
