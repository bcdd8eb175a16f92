"""CLI entrypoint — usable directly or via ``ray job submit``:

    python -m seo_crawler_ray generate --out /tmp/corpus --pages 2000
    python -m seo_crawler_ray crawl --corpus /tmp/corpus --out /tmp/crawl \
        [--resume] [--mode priority] [--max-depth 12] [--max-urls N]
    python -m seo_crawler_ray export --crawl /tmp/crawl --kind pages_csv \
        --out /tmp/pages.csv
    python -m seo_crawler_ray prepare --docs documents.parquet \
        --out /tmp/prep [--min-tokens 5] [--probe "bench text"] [--resume]
    ray job submit --working-dir . -- python -m seo_crawler_ray crawl ...

Owns a Ray session only when none exists (``ray job submit`` and the driver
initialize Ray themselves; ``ray.init`` here is guarded per the contract in
/root/repo/__ray_entry__.py).
"""
from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray():
    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False


def cmd_generate(args) -> int:
    from .sources.corpus import generate_corpus
    generate_corpus(args.out, args.pages, seed=args.seed)
    print(json.dumps({"corpus": args.out, "pages": args.pages}))
    return 0


def cmd_crawl(args) -> int:
    _ensure_ray()
    from .pipelines.crawl import CrawlJob
    from .sources.cache import flagship_config
    overrides = {}
    if args.max_depth is not None:
        overrides["max_depth"] = args.max_depth
    if args.max_urls is not None:
        overrides["max_urls"] = args.max_urls
    if args.javascript:
        overrides["enable_javascript"] = True
    cfg = flagship_config(**overrides)
    job = CrawlJob(args.corpus, args.out, cfg, mode=args.mode)
    summary = job.run(resume=args.resume)
    print(json.dumps({k: v for k, v in summary.items() if k != "waves"}))
    return 0


def cmd_export(args) -> int:
    _ensure_ray()
    import ray.data
    from .pipelines import analysis
    from .pipelines.exports import export_pages_csv, links_csv_rows
    pages = ray.data.read_parquet(f"{args.crawl}/pages")
    if args.kind == "pages_csv":
        export_pages_csv(pages, args.out)
    elif args.kind == "links_csv":
        links = ray.data.read_parquet(f"{args.crawl}/links")
        links.map_batches(links_csv_rows,
                          batch_format="pyarrow").write_csv(args.out)
    elif args.kind == "issues_json":
        from .sources.cache import flagship_config
        cfg = flagship_config()
        df = analysis.crawl_issues(pages, cfg.issue_exclusion_patterns).to_pandas()
        from .pipelines.exports import issues_by_url
        with open(args.out, "w") as f:
            json.dump({"total_issues": len(df),
                       "issues_by_url": issues_by_url(df)}, f, indent=2)
    elif args.kind in ("pages_json", "pages_xml"):
        import time
        from .pipelines.exports import json_export, xml_export
        fields = ["url", "status_code", "title", "word_count",
                  "internal_links", "external_links", "canonical_url"]
        pdf = (pages.select_columns(fields + ["rank"]).sort("rank")
               .to_pandas())
        rows = pdf[fields].to_dict("records")
        stamp = time.strftime("%Y-%m-%d %H:%M:%S")
        out = (json_export(rows, fields, stamp) if args.kind == "pages_json"
               else xml_export(rows, fields, stamp))
        with open(args.out, "w") as f:
            f.write(out)
    else:
        print(f"unknown export kind {args.kind}", file=sys.stderr)
        return 2
    print(json.dumps({"export": args.out, "kind": args.kind}))
    return 0


def cmd_prepare(args) -> int:
    _ensure_ray()
    from .pipelines.prepare import prepare_training_data
    probes = tuple(args.probe or ())
    manifest = prepare_training_data(
        args.docs, args.out, min_tokens=args.min_tokens, probes=probes,
        output_format=args.format, resume=args.resume)
    print(json.dumps(manifest))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="seo_crawler_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="generate a synthetic web corpus")
    g.add_argument("--out", required=True)
    g.add_argument("--pages", type=int, default=2000)
    g.add_argument("--seed", type=int, default=42)
    g.set_defaults(fn=cmd_generate)

    c = sub.add_parser("crawl", help="run the frontier-expansion crawl")
    c.add_argument("--corpus", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--resume", action="store_true")
    c.add_argument("--mode", choices=["parity", "priority"], default="parity")
    c.add_argument("--max-depth", type=int, default=None)
    c.add_argument("--max-urls", type=int, default=None)
    c.add_argument("--javascript", action="store_true",
                   help="render every URL before extraction (JS mode; "
                        "simulated renderer — real browser is env-gated)")
    c.set_defaults(fn=cmd_crawl)

    e = sub.add_parser("export", help="export crawl outputs")
    e.add_argument("--crawl", required=True)
    e.add_argument("--kind", default="pages_csv",
                   choices=["pages_csv", "links_csv", "issues_json",
                            "pages_json", "pages_xml"])
    e.add_argument("--out", required=True)
    e.set_defaults(fn=cmd_export)

    t = sub.add_parser("prepare", help="end-to-end training-data prep: "
                       "filter -> dedup -> decontaminate -> split -> shards")
    t.add_argument("--docs", required=True,
                   help="documents parquet file (doc_id,text,lang,source,"
                        "n_chars)")
    t.add_argument("--out", required=True)
    t.add_argument("--min-tokens", type=int, default=5)
    t.add_argument("--probe", action="append",
                   help="contamination probe text (repeatable)")
    t.add_argument("--format", choices=["parquet", "jsonl"],
                   default="parquet")
    t.add_argument("--resume", action="store_true")
    t.set_defaults(fn=cmd_prepare)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
