"""CLI driver: the reference's command surface, corpus-scale.

Reference commands (``cli.py:166-239``) operate on one PDF:
``scan`` / ``resolve`` / ``verify`` / ``full``. Here the unit of work
is a Parquet corpus; the commands and arg grammars carry over:

    python -m vlm_ocr_doc_reader_ray.cli extract  <corpus_dir_or_file> -o OUT
    python -m vlm_ocr_doc_reader_ray.cli registry <corpus_dir_or_file> -o OUT --axes 1,3,5
    python -m vlm_ocr_doc_reader_ray.cli run      <corpus files...>    -o OUT   # checkpointed

Arg grammars reproduced from the reference:
- ``--pages "1,2,5-7"`` → sorted unique ints (``cli.py:47-86``,
  including the 1-2-3 error case), used to filter ``page_states``/
  registry rows by page;
- ``--axes "1,3,5"`` → positive ints (``cli.py:89-108``).

This module owns a Ray session (scripts do; library code does not).
"""

from __future__ import annotations

import argparse
import sys
from typing import List


def parse_pages_arg(raw: str | None) -> List[int] | None:
    """'1,2,5-7' → [1,2,5,6,7]; None/'' → None (all pages).

    Errors: empty items, non-ints, ranges with more than one dash,
    reversed ranges, values < 1 — matching the reference grammar."""
    if raw is None or raw.strip() == "":
        return None
    pages: set[int] = set()
    for item in raw.split(","):
        item = item.strip()
        if not item:
            raise ValueError("empty page item")
        if "-" in item:
            parts = item.split("-")
            if len(parts) != 2:
                raise ValueError(f"bad page range: {item!r}")
            lo, hi = (int(p) for p in parts)
            if lo < 1 or hi < lo:
                raise ValueError(f"bad page range: {item!r}")
            pages.update(range(lo, hi + 1))
        else:
            v = int(item)
            if v < 1:
                raise ValueError(f"bad page: {item!r}")
            pages.add(v)
    return sorted(pages)


def parse_axes_arg(raw: str | None) -> List[int]:
    """'1,3,5' → [1,3,5]; positive ints required."""
    if raw is None or raw.strip() == "":
        return [1, 3, 5]
    axes = []
    for item in raw.split(","):
        v = int(item.strip())
        if v < 1:
            raise ValueError(f"axis must be positive: {item!r}")
        axes.append(v)
    if not axes:
        raise ValueError("no axes given")
    return axes


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(
            address="local", include_dashboard=False, ignore_reinit_error=True,
            logging_level="ERROR",
        )
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    return ray


def main(argv: List[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="vlm-ocr-doc-reader-ray")
    ap.add_argument("--num-cpus", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_ex = sub.add_parser("extract", help="corpus → extracted parquet")
    p_ex.add_argument("corpus")
    p_ex.add_argument("-o", "--output", required=True)

    p_reg = sub.add_parser("registry", help="corpus → exploded entity registry parquet")
    p_reg.add_argument("corpus")
    p_reg.add_argument("-o", "--output", required=True)
    p_reg.add_argument("--axes", default="1,3,5")
    p_reg.add_argument("--pages", default=None)

    p_run = sub.add_parser("run", help="checkpointed corpus run with resume")
    p_run.add_argument("inputs", nargs="+")
    p_run.add_argument("-o", "--output", required=True)
    p_run.add_argument("--no-resume", action="store_true")

    p_full = sub.add_parser(
        "full",
        help="legacy one-shot surface (reference FullDescriptionOperation): "
        "text + structure + page states in one pass",
    )
    p_full.add_argument("corpus")
    p_full.add_argument("-o", "--output", required=True)
    p_full.add_argument("--pages", default=None)

    p_res = sub.add_parser(
        "resolve",
        help="entity-granular resume: re-resolve pending (resolution<1) "
        "rows of a saved registry against extracted text",
    )
    p_res.add_argument("--from", dest="registry", required=True,
                       help="registry parquet (as written by `registry`)")
    p_res.add_argument("--extracted", required=True,
                       help="extracted parquet (as written by `extract`)")
    p_res.add_argument("-o", "--output", required=True)
    p_res.add_argument("--pages", default=None)
    p_res.add_argument("--chunk-size", type=int, default=5)

    p_lk = sub.add_parser(
        "links",
        help="corpus → outlink table parquet (one row per <a href>, "
        "href resolved absolute, chrome flagged); --degree adds the "
        "per-host link profile alongside",
    )
    p_lk.add_argument("corpus")
    p_lk.add_argument("-o", "--output", required=True)
    p_lk.add_argument("--degree", action="store_true",
                      help="also write host_degree/ (per-host profile)")

    p_sh = sub.add_parser(
        "shards",
        help="corpus → balanced training shards in deterministic "
        "md5-shuffle order (byte-identical re-runs, skip-finished resume)",
    )
    p_sh.add_argument("corpus")
    p_sh.add_argument("-o", "--output", required=True)
    p_sh.add_argument("--docs-per-shard", type=int, default=10000)
    p_sh.add_argument("--key", default="url",
                      help="shuffle key column (default: url)")
    p_sh.add_argument("--seed", default="shuffle")

    p_cu = sub.add_parser(
        "curate",
        help="corpus → curated training sequences (quality gate → "
        "exact dedup → mixture rebalance → packing)",
    )
    p_cu.add_argument("corpus")
    p_cu.add_argument("-o", "--output", required=True)
    p_cu.add_argument("--seq-len", type=int, default=2048)

    p_ti = sub.add_parser(
        "tiers",
        help="corpus → per-doc training-tier labels (quality bands + "
        "Gopher repetition vector + entropy gate + CCNet tertile; "
        "tier/reason per doc, mixture summary on stdout)",
    )
    p_ti.add_argument("corpus")
    p_ti.add_argument("-o", "--output", required=True)
    p_ti.add_argument("--id-col", default="url")
    p_ti.add_argument("--entropy-min", type=float, default=4.0)

    p_sd = sub.add_parser(
        "dedup-spans",
        help="corpus → span-deduplicated corpus (drop every word "
        "covered by a corpus-duplicated n-gram, Lee-et-al-style); "
        "hashed 64-bit keys by default, --exact for the bit-exact "
        "string mode",
    )
    p_sd.add_argument("corpus")
    p_sd.add_argument("-o", "--output", required=True)
    p_sd.add_argument("--n", type=int, default=8)
    p_sd.add_argument("--min-count", type=int, default=2)
    p_sd.add_argument("--id-col", default="url")
    p_sd.add_argument("--text-col", default="text")
    p_sd.add_argument("--exact", action="store_true")

    p_ix = sub.add_parser(
        "index",
        help="corpus → persisted term index (postings parquet "
        "partitioned by term-hash bucket; `search` prunes its reads "
        "to the query terms' buckets)",
    )
    p_ix.add_argument("corpus")
    p_ix.add_argument("-o", "--output", required=True)
    p_ix.add_argument("--buckets", type=int, default=64)
    p_ix.add_argument("--id-col", default="url")
    p_ix.add_argument("--text-col", default="text")

    p_se = sub.add_parser(
        "search",
        help="top-k retrieval over a corpus (BM25, two streaming "
        "passes) or over a persisted `index` dir (--index: "
        "integer-count scoring through partition-pruned reads)",
    )
    p_se.add_argument("corpus_or_index")
    p_se.add_argument("-q", "--query", action="append", required=True,
                      help="query terms, space-separated; repeatable")
    p_se.add_argument("-k", type=int, default=10)
    p_se.add_argument("--index", action="store_true",
                      help="treat the positional arg as an `index` dir")
    p_se.add_argument("--buckets", type=int, default=64)
    p_se.add_argument("--id-col", default="url")
    p_se.add_argument("--text-col", default="text")

    args = ap.parse_args(argv)
    from vlm_ocr_doc_reader_ray.runtime import register_for_workers

    register_for_workers()
    ray = _init_ray(args.num_cpus)
    try:
        import ray.data as rd

        from vlm_ocr_doc_reader_ray.pipelines.extraction import extract, registry_table

        if args.cmd == "extract":
            ds = extract(rd.read_parquet(args.corpus), emit_spans=True, emit_registry=True)
            ds.write_parquet(args.output, mode="overwrite")
            print(f"wrote extracted rows to {args.output}")
        elif args.cmd == "links":
            import os

            from vlm_ocr_doc_reader_ray.stages.linkgraph import (
                host_link_degree,
                links_table,
            )

            corpus = rd.read_parquet(args.corpus, columns=["url", "html"])
            links = links_table(corpus)
            links_dir = os.path.join(args.output, "links")
            links.write_parquet(links_dir, mode="overwrite")
            print(f"wrote outlink table to {links_dir}")
            if args.degree:
                deg_dir = os.path.join(args.output, "host_degree")
                # feed from the just-written parquet: the degree pass
                # must not re-run the tag scan
                host_link_degree(rd.read_parquet(links_dir)).write_parquet(deg_dir, mode="overwrite")
                print(f"wrote host degree profile to {deg_dir}")
        elif args.cmd == "registry":
            axes = parse_axes_arg(args.axes)
            pages = parse_pages_arg(args.pages)
            reg = registry_table(
                extract(rd.read_parquet(args.corpus), axes=axes, emit_spans=False)
            )
            if pages is not None:
                import pyarrow.compute as pc

                reg = reg.map_batches(
                    lambda t: t.filter(pc.is_in(t.column("page_num"), pa_page_set(pages))),
                    batch_format="pyarrow",
                )
            reg.write_parquet(args.output, mode="overwrite")
            print(f"wrote registry rows to {args.output}")
        elif args.cmd == "full":
            # reference cli.py `full` (operations/full_description.py:91-133):
            # one monolithic pass → text + structure (+ page states);
            # --pages filters the page-anchored outputs (M13 grammar)
            import os as _os

            from vlm_ocr_doc_reader_ray.pipelines.extraction import (
                headers_table,
                page_states_table,
            )

            pages = parse_pages_arg(args.pages)
            ex = extract(rd.read_parquet(args.corpus), emit_spans=True, emit_registry=False)
            # ONE extraction pass: the written table carries the headers
            # column, so structure/page outputs derive from the sink
            ex.write_parquet(_os.path.join(args.output, "extracted"), mode="overwrite")
            written = rd.read_parquet(_os.path.join(args.output, "extracted"))
            heads = headers_table(written)
            states = page_states_table(written)
            if pages is not None:
                import pyarrow.compute as pc

                page_arr = pa_page_set(pages)
                heads = heads.map_batches(
                    lambda t: t.filter(pc.is_in(t.column("page"), page_arr)),
                    batch_format="pyarrow",
                )
                states = states.map_batches(
                    lambda t: t.filter(pc.is_in(t.column("page_num"), page_arr)),
                    batch_format="pyarrow",
                )
            heads.write_parquet(_os.path.join(args.output, "headers"), mode="overwrite")
            states.write_parquet(_os.path.join(args.output, "page_states"), mode="overwrite")
            print(f"wrote full description (extracted/headers/page_states) to {args.output}")
        elif args.cmd == "resolve":
            from vlm_ocr_doc_reader_ray.extract.sanitize import sanitize_registry_batch
            from vlm_ocr_doc_reader_ray.stages.registry_stage import (
                pending_entities,
                resolve_pending,
            )

            pages = parse_pages_arg(args.pages)
            reg = rd.read_parquet(args.registry).map_batches(
                sanitize_registry_batch, batch_format="pyarrow"
            )
            ex = rd.read_parquet(args.extracted)
            n_pending = pending_entities(reg, below_resolution=1).count()
            merged = resolve_pending(reg, ex, pages=pages, chunk_size=args.chunk_size)
            merged.write_parquet(args.output, mode="overwrite")
            print(
                f"resolved {n_pending} pending entities; "
                f"wrote merged registry to {args.output}"
            )
        elif args.cmd == "shards":
            from vlm_ocr_doc_reader_ray.pipelines.shards import (
                write_training_shards,
            )

            manifest = write_training_shards(
                rd.read_parquet(args.corpus),
                args.key,
                args.output,
                args.docs_per_shard,
                seed=args.seed,
            )
            n_new = int((~manifest["skipped"]).sum())
            print(
                f"wrote {n_new} shards, skipped {len(manifest) - n_new} "
                f"finished, {int(manifest['rows'].sum())} rows to {args.output}"
            )
        elif args.cmd == "curate":
            import pyarrow as _pa

            from vlm_ocr_doc_reader_ray.corpus.sqlmirror import MIX_WEIGHTS
            from vlm_ocr_doc_reader_ray.pipelines.curation import curate

            def _as_docs(batch):
                return _pa.table(
                    {
                        "doc_id": batch.column("url"),
                        "text": batch.column("text"),
                        "lang": batch.column("lang"),
                    }
                )

            docs = rd.read_parquet(
                args.corpus, columns=["url", "text", "lang"]
            ).map_batches(_as_docs, batch_format="pyarrow")
            curate(docs, MIX_WEIGHTS, seq_len=args.seq_len).write_parquet(
                args.output, mode="overwrite"
            )
            print(f"wrote curated sequences to {args.output}")
        elif args.cmd == "tiers":
            from vlm_ocr_doc_reader_ray.pipelines.curation import doc_tiers

            ds = rd.read_parquet(args.corpus, columns=[args.id_col, "text"])
            labeled = doc_tiers(
                ds, entropy_min=args.entropy_min, id_col=args.id_col
            )
            labeled.write_parquet(args.output, mode="overwrite")
            mix = (
                rd.read_parquet(args.output)
                .groupby("tier")
                .count()
                .to_pandas()
                .sort_values("tier", ignore_index=True)
            )
            summary = ", ".join(
                f"{r.tier}={r['count()']}" for _, r in mix.iterrows()
            )
            print(f"wrote doc tiers to {args.output} ({summary})")
        elif args.cmd == "dedup-spans":
            from vlm_ocr_doc_reader_ray.stages.scrub import span_dedup

            ds = rd.read_parquet(
                args.corpus, columns=[args.id_col, args.text_col]
            )
            out = span_dedup(
                ds,
                text_col=args.text_col,
                id_col=args.id_col,
                n=args.n,
                min_count=args.min_count,
                hashed=not args.exact,
            )
            out.write_parquet(args.output, mode="overwrite")
            print(f"wrote span-deduped corpus to {args.output}")
        elif args.cmd == "index":
            from vlm_ocr_doc_reader_ray.stages.text_analysis import (
                build_term_index,
            )

            ds = rd.read_parquet(
                args.corpus, columns=[args.id_col, args.text_col]
            )
            build_term_index(
                ds, args.output, n_buckets=args.buckets,
                text_col=args.text_col, id_col=args.id_col,
            )
            print(f"wrote term index ({args.buckets} buckets) to {args.output}")
        elif args.cmd == "search":
            from vlm_ocr_doc_reader_ray.stages.text_analysis import (
                bm25_search,
                keyword_search_indexed,
            )

            qmap = {
                i + 1: q.split(" ") for i, q in enumerate(args.query)
            }
            if args.index:
                res = keyword_search_indexed(
                    args.corpus_or_index, qmap, k=args.k,
                    n_buckets=args.buckets, id_col=args.id_col,
                )
            else:
                ds = rd.read_parquet(
                    args.corpus_or_index,
                    columns=[args.id_col, args.text_col],
                )
                res = bm25_search(
                    ds, qmap, k=args.k,
                    text_col=args.text_col, id_col=args.id_col,
                )
            df = res.to_pandas()
            if len(df):
                df = df.sort_values(["query_id", "rank"])
            for r in df.itertuples(index=False):
                print(f"q{r.query_id}\t#{r.rank}\t{getattr(r, args.id_col)}\t{r.score}")
            print(f"search: {len(df)} results over {len(qmap)} queries")
        elif args.cmd == "run":
            from vlm_ocr_doc_reader_ray.pipelines.checkpoint import run_checkpointed

            r = run_checkpointed(args.inputs, args.output, resume=not args.no_resume)
            print(
                f"ran partitions {r['ran']}, skipped {r['skipped']}, "
                f"rows {r['rows_written']}"
            )
        return 0
    finally:
        ray.shutdown()


def pa_page_set(pages: List[int]):
    import pyarrow as pa

    return pa.array(pages, type=pa.int64())


if __name__ == "__main__":
    sys.exit(main())
