"""Command-line entry points — the Ray-native replacement of the
reference's ``main.py``/``search_engine.run_engine``/GUI
(``/root/reference/main.py:1-7``, ``GUI.py``).

    python -m searchengine_ray build  <corpus_dir> <index_dir> [--stemming] [--min-df N]
    python -m searchengine_ray search <index_dir> "query text" [-k N] [--bmw] [--spell]
    python -m searchengine_ray batch  <index_dir> <queries.txt> <out_dir> [-k N]

Owns its Ray session (the library itself never calls ray.init).
"""

from __future__ import annotations

import argparse
import sys


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False,
                  "ignore_reinit_error": True, "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="searchengine_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build the inverted index")
    b.add_argument("corpus")
    b.add_argument("index_dir")
    b.add_argument("--stemming", action="store_true")
    b.add_argument("--min-df", type=int, default=1)
    b.add_argument("--analyzer", choices=["code", "simple"], default="code")
    b.add_argument("--positions", action="store_true",
                   help="store per-posting token positions (phrase queries)")
    b.add_argument("--no-resume", action="store_true")
    b.add_argument("--format", choices=["parquet", "jsonl", "csv"],
                   default="parquet",
                   help="corpus file format (jsonl/csv normalize into "
                        "the corpus schema; missing metadata defaults)")

    s = sub.add_parser("search", help="run one query")
    s.add_argument("index_dir")
    s.add_argument("query")
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--bmw", action="store_true")
    s.add_argument("--spell", action="store_true")
    s.add_argument("--snippets", action="store_true",
                   help="hydrate hits with a contextual text snippet")
    s.add_argument("--stemming", action="store_true", default=None)
    s.add_argument("--analyzer", choices=["code", "simple"], default=None)

    ad = sub.add_parser("add", help="incrementally ingest more documents "
                        "into an existing index (new generation)")
    ad.add_argument("corpus")
    ad.add_argument("index_dir")
    ad.add_argument("--stemming", action="store_true", default=None)
    ad.add_argument("--analyzer", choices=["code", "simple"], default=None)

    st = sub.add_parser("stats", help="print index stats (meta, "
                        "generations, tombstones, on-disk sizes)")
    st.add_argument("index_dir")

    de = sub.add_parser("delete", help="tombstone doc ids (queries stop "
                        "returning them; stats stale until compact)")
    de.add_argument("index_dir")
    de.add_argument("doc_ids", nargs="+", type=int)

    co = sub.add_parser("compact", help="rebuild without tombstones into "
                        "a new root (exact stats, generations folded)")
    co.add_argument("index_dir")
    co.add_argument("new_index_dir")
    co.add_argument("--stemming", action="store_true", default=None)
    co.add_argument("--analyzer", choices=["code", "simple"], default=None)

    mg = sub.add_parser("merge", help="merge two independently built "
                        "indexes into a new root (no re-tokenization; "
                        "configs must match, min_df=1, no tombstones)")
    mg.add_argument("index_a")
    mg.add_argument("index_b")
    mg.add_argument("new_index_dir")

    px = sub.add_parser("proximity", help="within-window co-occurrence "
                        "query (needs a --positions index)")
    px.add_argument("index_dir")
    px.add_argument("query")
    px.add_argument("--window", type=int, default=8)
    px.add_argument("--stemming", action="store_true", default=None)
    px.add_argument("--analyzer", choices=["code", "simple"], default=None)

    ph = sub.add_parser("phrase", help="exact phrase query (needs an index "
                                       "built with --positions)")
    ph.add_argument("index_dir")
    ph.add_argument("query")
    ph.add_argument("--stemming", action="store_true", default=None)
    ph.add_argument("--analyzer", choices=["code", "simple"], default=None)

    bo = sub.add_parser("bool", help="unranked boolean AND/NOT retrieval "
                                     "(prefix a term with - to negate)")
    bo.add_argument("index_dir")
    bo.add_argument("query")
    bo.add_argument("--stemming", action="store_true", default=None)
    bo.add_argument("--analyzer", choices=["code", "simple"], default=None)

    pr = sub.add_parser("prefix", help="wildcard/prefix retrieval: expand "
                                       "against the dictionary, OR postings")
    pr.add_argument("index_dir")
    pr.add_argument("prefix")
    pr.add_argument("--max-expansions", type=int, default=4)
    pr.add_argument("--stemming", action="store_true", default=None)
    pr.add_argument("--analyzer", choices=["code", "simple"], default=None)

    gp = sub.add_parser("grep", help="indexed substring search over a "
                        "documents parquet dir (builds/reuses the cached "
                        "trigram index; prints doc_id, count, first pos)")
    gp.add_argument("corpus_dir",
                    help="directory containing documents.parquet")
    gp.add_argument("needle", help="substring, >= 3 chars")

    eg = sub.add_parser("egrep", help="indexed regex search over a "
                        "documents parquet dir (required-literal trigram "
                        "prefilter; honest full scan when no safe literal)")
    eg.add_argument("corpus_dir")
    eg.add_argument("pattern", help="RE2-compatible regex")

    q = sub.add_parser("batch", help="run a queries.txt file -> results dir")
    q.add_argument("index_dir")
    q.add_argument("queries_file")
    q.add_argument("out_dir")
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--fmt", choices=["csv", "parquet"], default="csv")
    q.add_argument("--stemming", action="store_true", default=None)
    q.add_argument("--analyzer", choices=["code", "simple"], default=None)

    args = p.parse_args(argv)
    from searchengine_ray.config import IndexConfig

    analyzer = getattr(args, "analyzer", None)
    stemming = getattr(args, "stemming", None)
    positions = bool(getattr(args, "positions", False))
    ntp = ndp = dbits = None
    tie_col = None
    if args.cmd in ("search", "batch", "phrase", "proximity", "add",
                    "compact", "bool", "prefix"):
        # query-time analyzer settings default from the INDEX's recorded
        # config (index_meta.json) — querying a stemmed/simple index must
        # analyze queries the same way the documents were analyzed;
        # explicit CLI flags still override
        import json as _json
        from pathlib import Path as _Path

        meta_file = _Path(args.index_dir) / "index_meta.json"
        if meta_file.is_file():
            full_meta = _json.loads(meta_file.read_text())
            mc = full_meta.get("config", {})
            if analyzer is None:
                analyzer = mc.get("analyzer")
            if stemming is None:
                stemming = mc.get("stemming")
            positions = positions or bool(mc.get("store_positions", False))
            # ranking settings ride with the index too: searching a
            # recency-tie-break index must order the same way
            tie_col = mc.get("tie_break_column")
            ntp = full_meta.get("num_term_parts")
            ndp = full_meta.get("num_doc_parts")
            dbits = full_meta.get("doc_id_part_bits")
    kw = {}
    if tie_col:
        kw["tie_break_column"] = tie_col
    if ntp:
        kw["num_term_parts"] = int(ntp)
    if ndp:
        kw["num_doc_parts"] = int(ndp)
    if dbits:
        kw["doc_id_part_bits"] = int(dbits)
    cfg = IndexConfig(analyzer=analyzer or "code",
                      stemming=bool(stemming),
                      min_df=getattr(args, "min_df", 1),
                      store_positions=positions, **kw)
    if args.cmd == "stats":
        # pure file reads — no Ray session needed
        import json as _j
        from pathlib import Path as _P

        import pyarrow.parquet as _pq

        root = _P(args.index_dir)
        meta = _j.loads((root / "index_meta.json").read_text())
        sizes = {d: sum(f.stat().st_size for f in (root / d).glob("*.parquet"))
                 for d in ("docs", "postings", "dictionary", "doc_meta")
                 if (root / d).is_dir()}
        dead = 0
        if (root / "deletes.parquet").is_file():
            dead = _pq.ParquetFile(root / "deletes.parquet").metadata.num_rows
        print(_j.dumps({
            "N": meta.get("N"), "avgdl": meta.get("avgdl"),
            "n_terms": meta.get("n_terms"),
            "n_postings": meta.get("n_postings"),
            "generation": meta.get("generation"),
            "generations": len(meta.get("generations", [])),
            "tombstones": dead,
            "store_positions": meta.get("config", {}).get("store_positions"),
            "bytes": sizes,
        }, indent=1))
        return 0
    _init_ray(args.num_cpus)
    try:
        if args.cmd == "build":
            from searchengine_ray.pipelines.build import build_index

            src = args.corpus
            if args.format != "parquet":
                from searchengine_ray.sources.corpus_files import (
                    corpus_from_csv, corpus_from_jsonl)

                reader = (corpus_from_jsonl if args.format == "jsonl"
                          else corpus_from_csv)
                src = reader(args.corpus)
            paths = build_index(src, args.index_dir, cfg,
                                resume=not args.no_resume,
                                source_tag=(None if args.format == "parquet"
                                            else f"{args.format}:{args.corpus}"))
            print(paths.meta())
        elif args.cmd == "add":
            from searchengine_ray.pipelines.build import add_documents

            paths = add_documents(args.corpus, args.index_dir, cfg)
            print(paths.meta())
        elif args.cmd == "delete":
            from searchengine_ray.pipelines.build import delete_documents

            n = delete_documents(args.index_dir, args.doc_ids)
            print(f"{n} tombstones")
        elif args.cmd == "compact":
            from searchengine_ray.pipelines.build import compact_index

            paths = compact_index(args.index_dir, args.new_index_dir, cfg)
            print(paths.meta())
        elif args.cmd == "merge":
            from searchengine_ray.pipelines.build import merge_indexes

            paths = merge_indexes(args.index_a, args.index_b,
                                  args.new_index_dir)
            print(paths.meta())
        elif args.cmd == "search":
            from searchengine_ray.pipelines.query import IndexSearcher

            s_ = IndexSearcher(args.index_dir, cfg)
            method = "bmw" if args.bmw else "vectorized"
            if args.snippets:
                for rank, (doc, score, snip) in enumerate(
                        s_.search_with_snippets(args.query, args.k,
                                                method=method,
                                                spell_correct=args.spell), 1):
                    flat = " ".join(snip.split())   # one TSV row per hit
                    print(f"{rank}\t{doc}\t{score:.6f}\t{flat}")
            else:
                for rank, (doc, score) in enumerate(
                        s_.search(args.query, args.k, method=method,
                                  spell_correct=args.spell), 1):
                    print(f"{rank}\t{doc}\t{score:.6f}")
        elif args.cmd == "phrase":
            from searchengine_ray.pipelines.query import IndexSearcher

            s_ = IndexSearcher(args.index_dir, cfg)
            for doc, n in s_.phrase_search(args.query):
                print(f"{doc}\t{n}")
        elif args.cmd == "proximity":
            from searchengine_ray.pipelines.query import IndexSearcher

            s_ = IndexSearcher(args.index_dir, cfg)
            for doc, n in s_.proximity_search(args.query, args.window):
                print(f"{doc}\t{n}")
        elif args.cmd == "bool":
            from searchengine_ray.pipelines.query import IndexSearcher

            s_ = IndexSearcher(args.index_dir, cfg)
            for doc in s_.boolean_search(args.query):
                print(int(doc))
        elif args.cmd == "prefix":
            from searchengine_ray.pipelines.docsearch import _expand_prefixes
            from searchengine_ray.pipelines.build import IndexPaths
            from searchengine_ray.pipelines.query import IndexSearcher

            expanded = _expand_prefixes(IndexPaths(str(args.index_dir)),
                                        [(0, args.prefix)],
                                        args.max_expansions)
            s_ = IndexSearcher(args.index_dir, cfg)
            terms = expanded[0][1].split() if expanded else []
            docs, n_terms = s_.terms_union(terms)
            for doc, n in zip(docs, n_terms):
                print(f"{int(doc)}\t{int(n)}")
        elif args.cmd == "grep":
            from searchengine_ray.pipelines.trigram import (
                trigram_substring_search)

            df = trigram_substring_search(
                args.corpus_dir, [(0, args.needle)]).to_pandas() \
                .sort_values("doc_id")
            for r in df.itertuples(index=False):
                print(f"{int(r.doc_id)}\t{int(r.n_matches)}\t{int(r.first_pos)}")
        elif args.cmd == "egrep":
            from searchengine_ray.pipelines.trigram import (
                trigram_regex_search)

            df = trigram_regex_search(
                args.corpus_dir, [(0, args.pattern)]).to_pandas() \
                .sort_values("doc_id")
            for r in df.itertuples(index=False):
                print(f"{int(r.doc_id)}\t{int(r.n_matches)}\t{r.first_match}")
        elif args.cmd == "batch":
            from searchengine_ray.pipelines.query import search_queries
            from searchengine_ray.sources.queries_file import (read_queries_file,
                                                               write_results)

            qs = read_queries_file(args.queries_file)
            res = search_queries(args.index_dir, qs, k=args.k, config=cfg)
            write_results(res, args.out_dir, fmt=args.fmt)
            print(f"wrote results for {len(qs)} queries to {args.out_dir}")
    finally:
        import ray

        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
