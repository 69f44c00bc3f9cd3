"""Named query implementations backing ``__ray_entry__.queries()``, split
by domain (graph / relational / curation / events / crawl);
``from raylink.queries import q_x`` keeps working for every query.

Each function takes ``sf_dir`` (a testdata scale directory) and returns a
Ray Dataset / pyarrow Table. Column names and types match the corresponding
SQL oracle in ``raylink.oracles_sql`` exactly (the driver hash-compares
values). Graph queries run over the synthetic page corpus derived from
``documents`` (LINK SPEC v1, raylink/synth.py) with the 'mod' partitioner
and P=8 so subgraph identities are SQL-checkable; BSP checkpoints live
under deterministic /tmp keys — repeated calls resume instead of
recomputing."""

from raylink.queries._common import (  # noqa: F401
    PR_ITERS,
    HITS_ITERS,
    KATZ_ITERS,
    EIGEN_ITERS,
    HARMONIC_SEEDS,
    ANF_ROUNDS,
    DENSEST_SQL_ROUNDS,
    PPR_ITERS,
    WL_ROUNDS,
    LPA_COMMUNITY_ROUNDS,
    _SHIP_CUTOFF,
    _Q3_DATE,
    DSIR_TARGET,
    PERC_DIM,
    PERC_ROUNDS,
    MIX_SEED,
    GAP_QS,
    PACK_BUDGET,
    BOILER_MIN_DOCS,
    EGO_SEEDS,
    JP_ROUNDS,
    MATCH_ROUNDS,
    SPLIT_SEED,
    SPLIT_BOUNDS,
    _ckpt,
    _dual_graph,
    _cents,
    _parquet_rows,
    _docs,
    _plant_pii,
    _emb,
    _flatten_media_features,
    _planted_lines,
    _link_host_diversity,
)
from raylink.queries.graph import *  # noqa: F401,F403
from raylink.queries.relational import *  # noqa: F401,F403
from raylink.queries.curation import *  # noqa: F401,F403
from raylink.queries.events import *  # noqa: F401,F403
from raylink.queries.crawl import *  # noqa: F401,F403
