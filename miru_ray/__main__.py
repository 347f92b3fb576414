"""CLI: build / append / search / remove — the ``ray job submit`` surface.

Examples::

    python -m miru_ray build  --input /data/transcripts --index /data/idx
    python -m miru_ray search --index /data/idx --query "alpha beta" -k 10
    python -m miru_ray search --index /data/idx --query "role:user spark*" \
        --strategy ref-tfidf --gather
    python -m miru_ray remove --index /data/idx --doc-ids 3,17,42
    python -m miru_ray compact --src /data/idx --dst /data/idx2 \
        --docs-per-partition 1000000
    python -m miru_ray sync   --src /data/idx --dst /backup/idx
    python -m miru_ray siphon --index /data/idx --out /export/acts \
        --plugin role_route

Owns its Ray session (``ray.init(address="local", ...)``) — library code
never calls ray.init (driver contract).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="miru_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build or resume/append an index")
    b.add_argument("--input", required=True, help="parquet file/dir of transcripts")
    b.add_argument("--index", required=True, help="index output directory")
    b.add_argument("--docs-per-partition", type=int, default=100_000)
    b.add_argument("--num-shards", type=int, default=8)
    b.add_argument("--remove-stopwords", action="store_true")
    b.add_argument("--phrase-bigram-fields", default="",
                   help="comma-separated text fields that also index "
                        "2g: phrase bigrams (positions-free phrases)")
    b.add_argument("--positional-fields", default="",
                   help="text fields that store within-doc token positions "
                        "(index-only phrase queries of any length); must "
                        "equal the text fields and name exactly one field")
    b.add_argument("--overwrite", action="store_true")

    s = sub.add_parser("search", help="query an index")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True, help="Lucene-ish query string")
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--strategy", default="bm25",
                   choices=["bm25", "ref-tfidf", "time"])
    s.add_argument("--wand", action="store_true")
    s.add_argument("--gather", action="store_true",
                   help="include conv_id/turn_idx/text columns")
    s.add_argument("--highlight", action="store_true")
    s.add_argument("--explain", action="store_true",
                   help="print a per-term score breakdown for each hit "
                        "(the MiruSolution / Lucene-explain analogue)")
    s.add_argument("--num-readers", type=int, default=4)
    s.add_argument("--replicas", type=int, default=1,
                   help="reader replica pools per partition; >1 enables "
                        "hedged query racing (first answer wins)")
    s.add_argument("--hedge-delay", type=float, default=0.1,
                   help="seconds before an unanswered reader call is "
                        "also issued to the next replica")

    r = sub.add_parser("remove", help="tombstone documents")
    r.add_argument("--index", required=True)
    r.add_argument("--doc-ids", required=True, help="comma-separated doc ids")

    rp = sub.add_parser(
        "repair", help="versioned upsert: re-index existing turns in "
                       "place when a higher version arrives (the "
                       "reference's REPAIR delivery type)")
    rp.add_argument("--index", required=True)
    rp.add_argument("--input", required=True,
                    help="parquet file/dir of repair rows: conv_id, "
                         "turn_idx, int64 version + every doc field")

    st = sub.add_parser("stats", help="print the index's lineage + "
                        "per-partition/per-stage metrics from the manifest")
    st.add_argument("--index", required=True)
    st.add_argument("--partitions", action="store_true",
                    help="include the per-partition/segment table")

    y = sub.add_parser("sync", help="replicate an index (resume + verify)")
    y.add_argument("--src", required=True)
    y.add_argument("--dst", required=True)
    y.add_argument("--verify-only", action="store_true")

    c = sub.add_parser("compact", help="merge partitions + expunge "
                                       "tombstones into a new index")
    c.add_argument("--src", required=True)
    c.add_argument("--dst", required=True)
    c.add_argument("--docs-per-partition", type=int, default=None,
                   help="new partition size (default: keep the source's)")
    c.add_argument("--num-shards", type=int, default=None)
    c.add_argument("--overwrite", action="store_true")

    u = sub.add_parser("upgrade", help="additive schema upgrade: add "
                                       "keyword/numeric fields in place "
                                       "(re-encodes only the new fields)")
    u.add_argument("--index", required=True)
    u.add_argument("--add-keyword", default="",
                   help="comma-separated keyword fields to add")
    u.add_argument("--add-numeric", default="",
                   help="comma-separated int64 fields to add")
    u.add_argument("--add-list-keyword", default="",
                   help="comma-separated list<string> fields to add")

    dv = sub.add_parser("deliver", help="realtime delivery: push doc-id "
                        "ranges indexed since the last delivery to a "
                        "Parquet sink (at-least-once, durable cursor)")
    dv.add_argument("--index", required=True)
    dv.add_argument("--out", required=True,
                    help="sink directory (one Parquet file per range, "
                         "idempotent on re-delivery)")

    rq = sub.add_parser("request", help="execute a MiruRequest-shaped JSON "
                        "query document (the reference's POSTed request "
                        "shape) and print the MiruResponse-shaped answer")
    rq.add_argument("--index", help="index directory (single-tenant)")
    rq.add_argument("--tenants", help="tenant registry root — routes by "
                                      "the request's tenantId")
    rq.add_argument("--json", dest="req_json",
                    help="request document as a JSON string")
    rq.add_argument("--file", dest="req_file",
                    help="path of a JSON request document")
    rq.add_argument("--num-readers", type=int, default=4)

    si = sub.add_parser("siphon", help="run a siphon plugin over the index "
                                       "WAL (resumable, idempotent flush)")
    si.add_argument("--index", required=True)
    si.add_argument("--out", required=True, help="destination root "
                    "(tenant-partitioned parquet + resume cursor)")
    si.add_argument("--plugin", default="role_route",
                    help="built-in plugin name, or module:Class of a "
                         "SiphonPlugin subclass")

    args = p.parse_args(argv)

    import ray
    # only tear down a Ray session this CLI itself created: shutting down
    # a caller's session kills every live actor, and the NEXT Ray call
    # auto-inits a fresh cluster the old handles don't belong to ("It
    # might be dead or it's from a different cluster" on each use)
    owns_ray = not ray.is_initialized()
    if owns_ray:
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    import logging

    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    try:
        return _run(args)
    finally:
        if owns_ray:
            ray.shutdown()


def _run(args) -> int:
    if args.cmd == "build":
        from .config import IndexConfig
        from .index.build import build_index
        cfg = IndexConfig(docs_per_partition=args.docs_per_partition,
                          num_shards=args.num_shards,
                          remove_stopwords=args.remove_stopwords,
                          phrase_bigram_fields=tuple(
                              x for x in
                              args.phrase_bigram_fields.split(",") if x),
                          positional_fields=tuple(
                              x for x in
                              args.positional_fields.split(",") if x))
        m = build_index(args.input, args.index, cfg, overwrite=args.overwrite)
        print(json.dumps({k: m[k] for k in
                          ("n_docs", "n_convs", "total_len", "avgdl")}
                         | {"segments": len(m["segments"]),
                            "stages": m["stages"]}))
        return 0

    if args.cmd == "request":
        from .query.request import execute_request
        if bool(args.index) == bool(args.tenants):
            raise SystemExit("request: exactly one of --index / --tenants")
        if bool(args.req_json) == bool(args.req_file):
            raise SystemExit("request: exactly one of --json / --file")
        if args.req_file:
            with open(args.req_file) as f:
                req = json.load(f)
        else:
            req = json.loads(args.req_json)
        if args.tenants:
            from .index.tenants import TenantRegistry
            reg = TenantRegistry(args.tenants)
            try:
                print(json.dumps(execute_request(reg, req)))
            finally:
                reg.close()
        else:
            from .query.engine import Searcher
            s = Searcher(args.index, num_readers=args.num_readers)
            try:
                print(json.dumps(execute_request(s, req)))
            finally:
                s.close()
        return 0

    if args.cmd == "deliver":
        from .index.delivery import ParquetDeliverySink, deliver_new
        r = deliver_new(args.index, ParquetDeliverySink(args.out))
        print(json.dumps(r))
        return 0

    if args.cmd == "upgrade":
        import dataclasses
        import os
        from .config import IndexConfig
        from .index.upgrade import upgrade_index
        from .util import read_json
        old = IndexConfig.from_dict(read_json(
            os.path.join(args.index, "manifest.json"))["config"])
        split = lambda v: tuple(x for x in v.split(",") if x)  # noqa: E731
        new_cfg = dataclasses.replace(
            old,
            keyword_fields=tuple(old.keyword_fields)
                           + split(args.add_keyword),
            numeric_fields=tuple(old.numeric_fields)
                           + split(args.add_numeric),
            list_keyword_fields=tuple(old.list_keyword_fields)
                                + split(args.add_list_keyword))
        m = upgrade_index(args.index, new_cfg)
        print(json.dumps({"n_docs": m["n_docs"],
                          "segments": len(m["segments"]),
                          "config": m["config"]}))
        return 0

    if args.cmd == "search":
        from .query.engine import Searcher
        s = Searcher(args.index, num_readers=args.num_readers,
                     replicas=args.replicas,
                     hedge_delay_s=args.hedge_delay)
        res = s.topk(args.query, args.k, args.strategy, use_wand=args.wand)
        out = res.to_pandas()
        if (args.gather or args.highlight) and len(out):
            g = s.gather(out["doc_id"].tolist(),
                         ["conv_id", "turn_idx", "text"]).to_pandas()
            out = out.merge(g, on="doc_id", how="left")
            if args.highlight:
                from .query.highlight import highlight_rows
                # highlight with the SAME term set the engine scored with —
                # including prefix EXPANSIONS and phrase terms (a bare
                # collect over the AST would miss every `foo*` match)
                ast = s._to_ast(args.query)
                expansions, term_counts, _ = s._prepare(ast,
                                                        need_stats=False)
                terms = [t for t, c in term_counts.items()
                         if c > 0 and ":" not in t]
                out["fragment"] = highlight_rows(out["text"], terms)
                out = out.drop(columns=["text"])
        if args.explain and len(out):
            out["explain"] = [
                {**(e := s.explain(args.query, d, args.strategy)),
                 "terms": e["terms"].to_pylist()}
                for d in out["doc_id"].tolist()]
        for rec in out.to_dict(orient="records"):
            print(json.dumps(rec, default=str))
        s.close()
        return 0

    if args.cmd == "remove":
        from .query.engine import Searcher
        s = Searcher(args.index, num_readers=1)
        n = s.remove_docs([int(x) for x in args.doc_ids.split(",")])
        print(json.dumps({"tombstoned": n}))
        s.close()
        return 0

    if args.cmd == "repair":
        from .index.repair import repair_index
        m = repair_index(args.index, args.input)
        print(json.dumps(m["stages"]["repair"]))
        return 0

    if args.cmd == "stats":
        # lineage + metrics without opening the index: everything a
        # monitoring probe needs is in the committed manifest (the
        # per-partition lineage the build stages record)
        import os
        from .util import read_json
        m = read_json(os.path.join(args.index, "manifest.json"))
        seg_bytes = sum(
            os.path.getsize(os.path.join(args.index, s["path"]))
            for s in m["segments"]
            if os.path.exists(os.path.join(args.index, s["path"])))
        out = {
            "version": m["version"],
            "fingerprint": m["fingerprint"],
            "n_docs": m["n_docs"], "n_convs": m["n_convs"],
            "total_len": m["total_len"], "avgdl": m["avgdl"],
            "n_input_files": len(m.get("input_files", [])),
            "n_partitions": len(m["partitions"]),
            "n_segments": len(m["segments"]),
            "n_terms": int(sum(s["n_terms"] for s in m["segments"])),
            "n_postings": int(sum(s["n_postings"] for s in m["segments"])),
            "segment_bytes": seg_bytes,
            "positional": bool(
                m["config"].get("positional_fields")),
            "stage_metrics": m.get("stages", {}),
        }
        print(json.dumps(out))
        if args.partitions:
            for s in m["segments"]:
                print(json.dumps(s))
        return 0

    if args.cmd == "compact":
        from .index.compact import compact_index
        m = compact_index(args.src, args.dst,
                          docs_per_partition=args.docs_per_partition,
                          num_shards=args.num_shards,
                          overwrite=args.overwrite)
        print(json.dumps({k: m[k] for k in
                          ("n_docs", "n_convs", "total_len", "avgdl")}
                         | {"segments": len(m["segments"]),
                            "compaction": m["compaction"]}))
        return 0

    if args.cmd == "siphon":
        import dataclasses

        from .index.siphon import RoleRouteSiphon, run_siphon
        if args.plugin == "role_route":
            plug = RoleRouteSiphon()
        else:
            import importlib
            modname, clsname = args.plugin.split(":", 1)
            plug = getattr(importlib.import_module(modname), clsname)()
        res = run_siphon(args.index, plug, args.out)
        print(json.dumps(dataclasses.asdict(res)))
        return 0

    if args.cmd == "sync":
        from .index.sync import sync_index, verify_sync
        if args.verify_only:
            v = verify_sync(args.dst)
            print(json.dumps(v))
            return 0 if v["ok"] else 1
        st = sync_index(args.src, args.dst)
        v = verify_sync(args.dst)
        print(json.dumps({**st, "verified": v["ok"]}))
        return 0 if v["ok"] else 1
    return 2


if __name__ == "__main__":
    sys.exit(main())
