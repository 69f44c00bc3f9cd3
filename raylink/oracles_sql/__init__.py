"""ANSI-SQL oracles (DuckDB dialect), split by domain mirroring raylink.queries; ``from raylink.oracles_sql import x_sql`` keeps working for every oracle."""

from raylink.oracles_sql._common import (  # noqa: F401
    P,
    GRAPH_CTES,
    CC_CTE,
    SG_CTE,
    _STOP,
    PAGE_TEXT_CTES,
    _M64,
    _M32,
    _with,
    _pagerank_ctes,
    _lpa_label_ctes,
    _mul64,
    _add64,
    _sm64,
    _fnv64,
    _perceptron_ctes,
    _matching_ctes,
    _bpe_ctes,
    _kmeans_ctes,
)
from raylink.oracles_sql.graph import *  # noqa: F401,F403
from raylink.oracles_sql.relational import *  # noqa: F401,F403
from raylink.oracles_sql.curation import *  # noqa: F401,F403
from raylink.oracles_sql.events import *  # noqa: F401,F403
from raylink.oracles_sql.crawl import *  # noqa: F401,F403
