"""Executable request-document examples (examples/requests/*.json).

One JSON document per reference plugin endpoint shape; each must
execute end-to-end through ``execute_request`` against an index built
with every feature the examples touch (keyword role/tool/conv_id,
power-bits from turn_idx) and produce a non-trivial, JSON-serializable
MiruResponse.  The files double as the request-surface cookbook — this
test keeps them runnable.
"""
import glob
import json
import os

import pytest

EXAMPLES = sorted(glob.glob(os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples", "requests", "*.json")))

#: per-shape sanity probe: the answer key that must be present and
#: non-empty (shape name → (key, non_empty))
_PROBES = {
    "fulltext": ("results", True),
    "distinct_count": ("aggregateTerms", True),
    "aggregate_counts": ("constraints", True),
    "analytics": ("waveforms", True),
    "trending": ("waveforms", True),
    "reco": ("results", True),
    "distincts": ("results", True),
    "uniques": ("uniques", False),
    "catwalk": ("results", True),
    "catwalk_combo": ("results", True),
    "strut": ("results", True),
    "stumptown": ("waveforms", True),
    "metrics": ("waveforms", True),
    "anomaly": ("waveforms", True),
    "composite_filter": ("results", True),
    "aggregate_counts_unread": ("constraints", True),
}


@pytest.fixture(scope="module")
def examples_searcher(ray_session, xs_path, tmp_path_factory):
    """xs index with every field surface the examples exercise."""
    from miru_ray.config import IndexConfig
    from miru_ray.index.build import build_index
    from miru_ray.query.engine import Searcher
    d = str(tmp_path_factory.mktemp("idx") / "xs_examples")
    build_index(xs_path, d, IndexConfig(
        docs_per_partition=2000, num_shards=1,
        keyword_fields=("role", "tool", "conv_id"),
        composite_fields=(("role_tool", ("role", "tool")),),
        power_bits_fields=(("bits", "turn_idx"),)))
    s = Searcher(d, num_readers=2)
    yield s
    s.close()


def test_example_inventory():
    # one example per dispatched endpoint shape, all probed
    names = {os.path.splitext(os.path.basename(p))[0] for p in EXAMPLES}
    assert names == set(_PROBES), names ^ set(_PROBES)


@pytest.mark.parametrize("path", EXAMPLES,
                         ids=[os.path.splitext(os.path.basename(p))[0]
                              for p in EXAMPLES])
def test_example_document_executes(examples_searcher, path):
    from miru_ray.query.request import execute_request
    with open(path) as f:
        doc = json.load(f)
    resp = execute_request(examples_searcher, doc)
    assert json.dumps(resp)  # fully JSON-serializable
    assert resp["log"], "logLevel INFO examples must carry a solution log"
    key, non_empty = _PROBES[os.path.splitext(os.path.basename(path))[0]]
    answer = resp["answer"]
    assert key in answer
    if non_empty:
        assert answer[key], f"{key} empty for {path}"


def test_example_file_via_cli(examples_searcher, capsys):
    """The cookbook documents run through the `request` CLI --file path
    unchanged."""
    from miru_ray.__main__ import main
    path = [p for p in EXAMPLES if p.endswith("fulltext.json")][0]
    idx = examples_searcher.index_dir
    assert main(["request", "--index", idx, "--file", path,
                 "--num-readers", "2"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["answer"]["results"]
