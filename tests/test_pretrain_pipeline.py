"""The composed pretraining-corpus pipeline: behavior invariants beyond
the SQL-oracle parity the gate already witnesses."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _brute(sf_dir):
    """Independent single-process reference of every gate, built from the
    row-level definitions (NOT the engine's batch/shuffle machinery)."""
    from miru_ray.fixtures import derive_docs_dup
    from miru_ray.ops.dedup import _shingles
    from miru_ray.ops.mixing import RATE_MILLIONTHS, _M, _doc_hash_m
    from miru_ray.ops.textstats import DECON_BENCH_MOD, predict_lang
    from miru_ray.pipelines.curate import (MAX_STOP_RATIO, MAX_TOKENS,
                                           MIN_TOKENS)
    from miru_ray.tokenize import EN_STOPWORDS, explode_tokens
    from miru_ray.util import md5_64

    base = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text", "source"])
    dup = derive_docs_dup(base.select(["doc_id", "text"]))
    # re-attach sources the way the derivation defines them
    src0 = np.asarray(base["source"].to_pandas(), dtype=object)
    did0 = base["doc_id"].to_numpy()
    src = np.concatenate([src0, src0[did0 % 5 == 3], src0[did0 % 5 == 1]])
    ids = dup["doc_id"].to_numpy()
    texts = np.asarray(dup["text"].to_pandas(), dtype=object)

    toks = [[] for _ in ids]
    terms, rows, dl = explode_tokens(dup["text"])
    t_np = np.asarray(terms.to_pandas(), dtype=object)
    for t, r in zip(t_np, rows):
        toks[r].append(t)

    bench_sh = set()
    for i, d in enumerate(ids):
        if d % DECON_BENCH_MOD == 0:
            bench_sh |= _shingles(toks[i])

    pred = predict_lang(dup["text"])
    out = {}
    # exact dedup on the training side: min doc_id per text
    surv_of = {}
    for i, d in enumerate(ids):
        if d % DECON_BENCH_MOD == 0:
            continue
        t = texts[i]
        if t not in surv_of or d < surv_of[t]:
            surv_of[t] = d
    survivors = set(surv_of.values())
    for i, d in enumerate(ids):
        if d % DECON_BENCH_MOD == 0 or d not in survivors:
            continue
        nt = len(toks[i])
        ns = sum(1 for t in toks[i] if t in EN_STOPWORDS)
        ratio = ns / nt if nt > 0 else 1.0
        if not (MIN_TOKENS <= nt <= MAX_TOKENS and ratio <= MAX_STOP_RATIO):
            continue
        sh = _shingles(toks[i])
        if sh and 2 * len(sh & bench_sh) >= len(sh):
            continue
        # uint64 % python-int promotes to float64 and mangles low bits —
        # modulo must stay in uint64 (same rule as the engine/mixing code)
        thr = RATE_MILLIONTHS[int(md5_64([src[i]])[0]
                                  % np.uint64(len(RATE_MILLIONTHS)))]
        if int(_doc_hash_m(np.array([d]))[0]) >= thr:
            continue
        k = (src[i], pred[i])
        n, tok = out.get(k, (0, 0))
        out[k] = (n + 1, tok + nt)
    return out


def test_pretrain_counts_match_bruteforce(ray_session):
    from miru_ray.pipelines.curate import pretrain_corpus_counts
    got = pretrain_corpus_counts(SF).to_pandas()
    want = _brute(SF)
    assert len(got) == len(want)
    for _, r in got.iterrows():
        n, tok = want[(r["source"], r["lang"])]
        assert (int(r["n_docs"]), int(r["n_tokens"])) == (n, tok)
    # sorted output contract
    assert list(got.columns) == ["source", "lang", "n_docs", "n_tokens"]
    assert got.sort_values(["source", "lang"]).reset_index(drop=True) \
             .equals(got)


def test_pretrain_gates_actually_fire(tmp_path, ray_session):
    """A corpus planted so every gate decides at least one doc: an exact
    dup pair, a contaminated doc, a too-short doc, and a kept doc — and
    the benchmark doc itself never reaches the output."""
    from miru_ray.ops.mixing import RATE_MILLIONTHS, _doc_hash_m
    from miru_ray.pipelines.curate import pretrain_corpus_counts
    from miru_ray.util import md5_64

    # find a source string whose rate bucket is keep-all so the mixture
    # gate never interferes with this test's other gates
    source = next(s for s in ("s%d" % i for i in range(64))
                  if RATE_MILLIONTHS[int(md5_64([s])[0] % np.uint64(4))]
                  == 1_000_000)
    body = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lamda mu nu xi omicron pi rho sigma tau upsilon " * 3).strip()
    # the benchmark doc is LONG (so a near-copy of it crosses the 50%
    # shingle-coverage contamination bar while still passing quality) and
    # vocabulary-DISJOINT from body (so the kept doc shares nothing)
    bench_text = " ".join(f"zz{i}" for i in range(50))
    # doc_ids chosen to dodge the dup-derivation planting (%5 not in {1,3})
    # and the benchmark split (%29 != 0), except doc 29 = the benchmark doc
    rows = [
        (29, bench_text),                       # benchmark member
        (30, body + " unique one"),             # kept
        (32, bench_text + " tail"),             # ~all shingles shared ->
        # contaminated at the 50% bar (and passes quality: 51 tokens)
        (34, "too short"),                      # quality-dropped
        (35, body + " unique one"),             # exact dup of doc 30
        # (higher id) -> dropped by dedup
    ]
    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows], pa.string()),
                  "source": pa.array([source] * len(rows), pa.string()),
                  "lang": pa.array(["en"] * len(rows), pa.string()),
                  "n_chars": pa.array([len(r[1]) for r in rows], pa.int64())})
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pq.write_table(t, os.path.join(d, "documents.parquet"))

    got = pretrain_corpus_counts(d).to_pandas()
    # survivors: doc 30 (kept), 32 (contaminated -> dropped), 34 (short ->
    # dropped), 35 (exact dup of 30, higher id -> dropped), 29 (benchmark
    # -> excluded).  Only doc 30 remains — IF its mixture draw keeps it.
    kept_mix = int(_doc_hash_m(np.array([30]))[0]) < 1_000_000
    assert kept_mix  # rate is 1e6 (keep-all) by construction
    assert len(got) == 1
    r = got.iloc[0]
    assert r["source"] == source and int(r["n_docs"]) == 1
    assert int(r["n_tokens"]) == len((body + " unique one").split())


def test_documents_src_matches_sql(ray_session):
    import duckdb

    from miru_ray.fixtures import DOCS_DUP_SRC_SQL
    from miru_ray.pipelines.curate import _documents_src
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * "
                f"FROM '{SF}/documents.parquet'")
    sql = con.execute(DOCS_DUP_SRC_SQL + " ORDER BY doc_id").fetchdf()
    eng = (_documents_src(SF).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    for c in ("doc_id", "text", "source"):
        assert (sql[c].to_numpy() == eng[c].to_numpy()).all()


def test_pretrain_export_reconciles_with_summary(tmp_path, ray_session):
    """out_path: the streamed kept rows must aggregate to exactly the
    returned (source, lang) summary, and be written with deterministic
    range-named parts; a pre-existing directory refuses (export = one
    directory per run)."""
    import glob

    import pandas as pd

    from miru_ray.pipelines.curate import pretrain_corpus_counts
    out = str(tmp_path / "kept")
    got = pretrain_corpus_counts(SF, out_path=out).to_pandas()
    parts = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    assert parts, "export wrote no part files"
    rows = pd.concat([pq.read_table(p).to_pandas() for p in parts])
    agg = (rows.groupby(["source", "lang"], as_index=False)
           .agg(n_docs=("doc_id", "count"), n_tokens=("n_tokens", "sum"))
           .sort_values(["source", "lang"]).reset_index(drop=True))
    assert agg[["source", "lang"]].values.tolist() == \
        got[["source", "lang"]].values.tolist()
    assert (agg["n_docs"].to_numpy() == got["n_docs"].to_numpy()).all()
    assert (agg["n_tokens"].to_numpy() == got["n_tokens"].to_numpy()).all()
    assert rows["doc_id"].is_unique
    with pytest.raises(FileExistsError):
        pretrain_corpus_counts(SF, out_path=out)
