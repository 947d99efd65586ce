"""CLI entry point — the engine's analogue of the reference's
``scripts/localRDFa.py`` (getopt flags -> Options -> rdf_from_sources).

    python -m rdfa_ray.cli --input /path/to/transcripts_parquet \
        --output /tmp/kg_out [--parts 64] [--no-link] [--no-resume] \
        [--rdfa-version 1.0] [--space-preserve/--no-space-preserve] \
        [--no-embedded-rdf] [--check-lite] [--vocab-expansion] \
        [--num-cpus N]

Owns its Ray session (guarded init) — library code never calls
ray.init (driver contract).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from .sources.io import read_parquet as read_parquet_clean


def main(argv=None):
    p = argparse.ArgumentParser(description="rdfa_ray KG-construction pipeline")
    p.add_argument("--input", required=True, help="transcripts parquet file/dir, or markup files/dir with --input-format markup")
    p.add_argument(
        "--input-format",
        choices=["parquet", "markup"],
        default="parquet",
        help="'parquet': transcript table (conv_id, turn_idx, text, ...);"
        " 'markup': directory/glob of (X)HTML/SVG/XML documents — the"
        " reference CLI's file mode, one document per row"
        " (sources/markupfiles.py)",
    )
    p.add_argument(
        "--on-malformed",
        choices=["raise", "skip"],
        default="raise",
        help="with --input-format markup: 'skip' quarantines undecodable"
        " files instead of failing the whole run",
    )
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument(
        "--parts", type=int, default=None,
        help="output partitions (default: sized from the input row count)",
    )
    p.add_argument(
        "--serialize", choices=sorted(
            {"turtle", "n3", "ttl", "xml", "pretty-xml", "nt", "ntriples",
             "json-ld", "json", "jsonld"}
        ), default=None,
        help="additionally write one serialized document per graph "
        "(reference CLI output formats; N-Quads+Parquet always written)",
    )
    p.add_argument("--no-link", action="store_true", help="skip entity linking/canonicalization")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--rdfa-version", choices=["1.0", "1.1"], default=None)
    p.add_argument("--no-space-preserve", action="store_true")
    p.add_argument("--no-embedded-rdf", action="store_true")
    p.add_argument("--check-lite", action="store_true")
    p.add_argument("--vocab-expansion", action="store_true")
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument(
        "--query",
        default=None,
        help="SPARQL SELECT/ASK/CONSTRUCT string to run over the distilled"
        " triples (results land in <output>/query_result)",
    )
    p.add_argument(
        "--explain",
        action="store_true",
        help="with --query: print the parsed plan (EXPLAIN) instead of"
        " executing it; nothing is distilled or written",
    )
    args = p.parse_args(argv)

    if args.explain:
        if not args.query:
            p.error("--explain requires --query")
        from rdfa_ray.stages.sparql_text import explain

        print(explain(args.query))
        return

    import ray

    if not ray.is_initialized():
        # Under `ray job submit` the job runtime exports RAY_ADDRESS for
        # the cluster; honor it.  Only a standalone local run gets the
        # num_cpus cap (sizing an existing cluster is not ours to do).
        addr = os.environ.get("RAY_ADDRESS", "local")
        init_kwargs = dict(ignore_reinit_error=True, logging_level="ERROR")
        if addr == "local":
            init_kwargs.update(
                num_cpus=args.num_cpus, include_dashboard=False
            )
        ray.init(address=addr, **init_kwargs)
    import ray.data as rd

    ctx = rd.DataContext.get_current()
    ctx.enable_progress_bars = False
    # see bench.py: default per-operator CPU reservations fragment small
    # local clusters and throttle the fused map stage; below 8 cpus a
    # zero reservation instead serializes the map behind the shuffle
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    ctx.op_resource_reservation_ratio = 0.0 if ncpu >= 8 else 0.25

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from rdfa_ray.pipelines.flagship import run_flagship

    options_kwargs = {
        "space_preserve": not args.no_space_preserve,
        "embedded_rdf": not args.no_embedded_rdf,
        "check_lite": args.check_lite,
        "vocab_expansion": args.vocab_expansion,
    }

    if args.input_format == "markup":
        from rdfa_ray.sources.markupfiles import read_markup_documents

        turns = read_markup_documents(
            args.input, on_malformed=args.on_malformed
        )
    else:
        turns = read_parquet_clean(args.input)
        # fail loudly BEFORE launching the pipeline: a wrong input table
        # (e.g. documents.parquet) otherwise dies deep inside a Ray task
        # with a bare KeyError and an empty output directory
        missing = {"conv_id", "turn_idx", "text"} - set(turns.schema().names)
        if missing:
            raise SystemExit(
                "input %s is not a transcripts table: missing column(s) %s "
                "(expected conv_id, turn_idx, role, text, tool, ts)"
                % (args.input, sorted(missing))
            )
    summary = run_flagship(
        turns,
        args.output,
        n_parts=args.parts,
        resume=not args.no_resume,
        link=not args.no_link,
        options_kwargs=options_kwargs,
    )
    if args.serialize:
        from rdfa_ray.pipelines.flagship import build_triples
        from rdfa_ray.stages.distill import split_triples
        from rdfa_ray.stages.serialize import serialize_graphs

        triples = build_triples(
            read_parquet_clean(args.input), options_kwargs=options_kwargs
        ).map_batches(split_triples, batch_format="pyarrow")
        serialize_graphs(triples, args.serialize, contiguous=True).write_parquet(
            os.path.join(args.output, "serialized_%s" % args.serialize)
        )
    if args.query:
        from rdfa_ray.pipelines.flagship import build_triples
        from rdfa_ray.stages.distill import split_triples
        from rdfa_ray.stages.sparql_text import execute

        triples = (
            build_triples(read_parquet_clean(args.input), options_kwargs=options_kwargs)
            .map_batches(split_triples, batch_format="pyarrow")
            .select_columns(["subj", "pred", "obj_value"])
        )
        execute(triples, args.query).write_parquet(
            os.path.join(args.output, "query_result")
        )
    print(
        json.dumps(
            {
                "partitions_written": len(summary),
                "rows": int(summary["rows"].sum()) if len(summary) else 0,
                "triples": int(summary["triples"].sum()) if len(summary) else 0,
                "diagnostics": int(summary["diagnostics"].sum()) if len(summary) else 0,
                "output": args.output,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
