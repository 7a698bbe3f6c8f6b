"""Graph-analytics plans: PageRank over the item co-rating graph.

The oracle is the SAME power iteration unrolled as a DuckDB WITH
chain (it1..itN), with every iteration quantized by the shared
floor-half-up qround — an iterative algorithm made value-hash
verifiable by bounding the iteration count and pinning the float
grid each round.  Companion registered graph query:
``neardup_components`` (plans/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.rounding import qround_sql
from ..operators.pagerank import PR_ROUND, corating_edges, pagerank
from .recsys import RATINGS_CTE, _cached_ratings
from .registry import register

PAGERANK_ITERS = 5
PAGERANK_DAMPING = 0.85
#: hot-user cutoff for the co-rating pair join — part of the query
#: SEMANTICS (mirrored in the oracle), not a silent approximation
MAX_ITEMS_PER_USER = 500


def _pagerank_sql(
    iters: int = PAGERANK_ITERS,
    damping: float = PAGERANK_DAMPING,
    cap: int = MAX_ITEMS_PER_USER,
) -> str:
    contrib = """
  SELECT e.dst AS id, sum(p.pr * e.w / d.deg) AS c
  FROM edges e JOIN {prev} p ON e.src = p.id JOIN deg d ON d.src = e.src
  GROUP BY 1
"""
    # interpolate the PYTHON-computed teleport constant: DuckDB would
    # evaluate 1.0 - 0.85 in DECIMAL (exactly 0.15) while Spark embeds
    # the Python double 0.15000000000000002 — a systematic 1-ulp
    # divergence per node per iteration that can straddle a 7-dp
    # rounding boundary
    step = (
        "it{i} AS (\n"
        "  SELECT nodes.id, "
        + qround_sql(
            f"{(1.0 - damping)!r} / nn.n + {damping!r} * COALESCE(c.c, 0.0)",
            PR_ROUND,
        )
        + " AS pr\n"
        "  FROM nodes CROSS JOIN nn LEFT JOIN (" + contrib + ") c"
        " ON c.id = nodes.id\n)"
    )
    its = ",\n".join(
        step.format(i=i, prev=f"it{i - 1}" if i > 1 else "pr0")
        for i in range(1, iters + 1)
    )
    return f"""
WITH {RATINGS_CTE},
ok_users AS (
  SELECT user_id FROM ratings GROUP BY 1 HAVING count(*) <= {cap}
),
r2 AS (SELECT r.* FROM ratings r JOIN ok_users USING (user_id)),
edges AS (
  SELECT a.item_id AS src, b.item_id AS dst, CAST(count(*) AS DOUBLE) AS w
  FROM r2 a JOIN r2 b ON a.user_id = b.user_id AND a.item_id <> b.item_id
  GROUP BY 1, 2
),
nodes AS (
  -- src UNION dst, mirroring operators/pagerank.py: identical on this
  -- symmetric co-rating graph, but a reuse with an asymmetric edge
  -- set must not silently drop sink nodes from the oracle side
  SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges
),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
deg AS (SELECT src, CAST(sum(w) AS DOUBLE) AS deg FROM edges GROUP BY 1),
pr0 AS (SELECT id, 1.0 / nn.n AS pr FROM nodes CROSS JOIN nn),
{its}
SELECT id AS item_id, pr AS pagerank FROM it{iters}
"""


@register(
    # new in r4 (registry window full at 50); rotate REGISTERED in r5
    "item_pagerank",
    oracle=_pagerank_sql(),
)
def item_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank importance of every item over the co-rating graph
    (operators/pagerank.py): 5 damped power iterations, quantized per
    iteration so the unrolled-SQL oracle replays them exactly.
    Items nobody co-rated are not in the graph (no edges) and carry
    no rank row — documented, mirrored by the oracle."""
    edges = corating_edges(
        _cached_ratings(spark, sf_dir),
        max_items_per_user=MAX_ITEMS_PER_USER,
    )
    pr = pagerank(edges, PAGERANK_ITERS, PAGERANK_DAMPING)
    return pr.select(
        pr.id.alias("item_id"), pr.pr.alias("pagerank")
    )
