"""raylink — a Ray-Data-native subgraph-centric link-graph analytics engine.

Rebuilt from scratch with the query/data-processing capabilities of
dream-lab/goffish_v3 (the reference, a Java subgraph-centric BSP framework on
Apache Hama/Giraph; see /root/repo/SURVEY.md), re-expressed Ray-Data-first:

- graph loading     -> ``ray.data.read_parquet`` + stateful actor-pool
                       ``map_batches`` HTML link extraction (``raylink.extract``)
- subgraph discovery-> hash partitioning + per-partition union-find inside
                       ``groupby(part).map_groups`` (``raylink.graph``)
- BSP supersteps    -> message Datasets shuffled with ``groupby(dst_part)``,
                       barrier == materialization, per-superstep parquet
                       checkpoints with lineage + metrics (``raylink.superstep``)
- algorithms        -> ``raylink.algos`` (pagerank, cc, lpa, triangles, sssp,
                       kcore, stats) mirroring the reference's sample-hama
                       algorithm library semantics
- training-data ops -> ``raylink.ops`` (dedup, similarity search, text
                       analysis, windows, multimodal plumbing)
"""

__version__ = "0.1.0"
