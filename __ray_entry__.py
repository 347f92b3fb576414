"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing here
calls ``ray.init`` / ``ray.shutdown``.

The flagship surface is the Ray-Data-native inverted-index + BM25 engine
(``miru_ray``): the transcripts input (BASELINE.json input_hint shape) is
derived deterministically from the ``documents`` testdata table with an
exactly-equivalent SQL mapping, so every index/query pipeline here has a
DuckDB oracle over the pre-registered views.  See SURVEY.md §2 for the
operator inventory each entry maps to.

``queries()`` / ``oracle_sql()`` are thin views over the engine's plugin
registry (``miru_ray.plugins`` — the MiruPlugin / Question / AnswerMerger
contract analogue): every operator family registers itself there, and a
user-contributed operator shows up here with one ``register_op`` call.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

QUERY_TERMS = ["spark", "merge"]          # hot terms of the documents vocab
OR_TERMS = ["spark", "merge", "dup"]      # includes the rare term 'dup'


def entry() -> Any:
    """Flagship pipeline on sf0.001: derive transcripts → build inverted
    index (map_batches tokenize → salted groupby(term-shard) → segment
    encode) → BM25 top-10 with gathered display columns."""
    from miru_ray.pipelines import flagship as F
    sf = "/root/testdata/sf0.001"
    res = F.q_bm25(sf, QUERY_TERMS, k=10, mode="and")
    s = F.searcher_for(sf)
    gathered = s.gather(res["doc_id"].to_pylist(),
                        ["conv_id", "turn_idx", "text"]).to_pandas()
    out = res.to_pandas().merge(gathered, on="doc_id", how="left")
    return out


def queries() -> dict[str, Callable[[str], Any]]:
    from miru_ray import plugins
    return plugins.queries()


def oracle_sql() -> dict[str, str]:
    from miru_ray import plugins
    return plugins.oracle_sql()
