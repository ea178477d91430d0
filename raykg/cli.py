"""CLI entry points: run / resume the KG pipeline, inspect a page, bench.

Usage (the only places outside tests/bench that own a Ray session):

  python -m raykg run --pages /data/pages --out /out/kg [--no-resume]
                      [--labels person organization ...] [--num-cpus 32]
  python -m raykg extract --text "..." [--labels ...] [--threshold 0.3]
  python -m raykg synth --sf-dir /root/testdata/sf0.01 --out /tmp/pages
                        [--repeat 4] [--files 16]
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="raykg")
    sub = p.add_subparsers(dest="cmd", required=True)

    runp = sub.add_parser("run", help="run the KG pipeline over pages parquet")
    runp.add_argument("--pages", required=True)
    runp.add_argument("--out", required=True)
    runp.add_argument("--labels", nargs="*", default=None)
    runp.add_argument("--no-resume", action="store_true")
    runp.add_argument("--no-link", action="store_true")
    runp.add_argument("--shard-size", type=int, default=8)
    runp.add_argument("--num-cpus", type=int, default=32)

    exp = sub.add_parser("extract", help="single-text extraction (oracle path)")
    exp.add_argument("--text", required=True)
    exp.add_argument("--labels", nargs="*", default=None)
    exp.add_argument("--threshold", type=float, default=None)

    # defaults mirror the reference harness (BenchmarkCLI.swift:73-91):
    # 5 iterations, 1 warmup, batch size 8, concurrency 1
    bp = sub.add_parser("bench", help="latency / throughput benchmark over "
                                      "JSONL fixtures (reference harness)")
    bp.add_argument("--fixtures", default=None,
                    help="benchmark JSONL; omitted → synthesize 50 samples")
    bp.add_argument("--mode", choices=["latency", "throughput"],
                    default="latency")
    bp.add_argument("--iterations", type=int, default=5)
    bp.add_argument("--warmup", type=int, default=1)
    bp.add_argument("--batch-size", type=int, default=8)
    bp.add_argument("--concurrency", type=int, default=1)
    bp.add_argument("--quiet", action="store_true")

    sy = sub.add_parser("synth", help="materialize a synthetic pages corpus")
    sy.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    sy.add_argument("--out", required=True)
    sy.add_argument("--repeat", type=int, default=1)
    sy.add_argument("--files", type=int, default=16)
    sy.add_argument("--num-cpus", type=int, default=32)

    args = p.parse_args(argv)

    if args.cmd == "extract":
        # single-document path: no cluster needed (the reference's
        # one-text CLI mode, BenchmarkCLI.swift:148-170)
        from .config import KG_LABELS
        from .oracle import Oracle

        o = Oracle()
        labels = args.labels or KG_LABELS
        mentions, triples = o.extract_with_triples(args.text, labels,
                                                   args.threshold)
        print(json.dumps({
            "mentions": [{"text": m.text, "label": m.label,
                          "score": round(m.score, 4),
                          "start": m.start, "end": m.end} for m in mentions],
            "triples": [{"subj": t.subj, "pred": t.pred, "obj": t.obj}
                        for t in triples],
        }, ensure_ascii=False, indent=1))
        return 0

    if args.cmd == "bench":
        # single-process benchmark like the reference's (no Ray session)
        import os as _os
        import tempfile

        from .oracle import Oracle
        from .sources.fixtures import write_benchmark_jsonl
        from .state.metrics import run_latency_mode, run_throughput_mode

        path = args.fixtures
        tmp_fd = None
        if path is None:
            tmp_fd, path = tempfile.mkstemp(prefix="raykg_fixtures_",
                                            suffix=".jsonl")
            write_benchmark_jsonl(path)
        samples = []
        with open(path, encoding="utf-8") as f:
            for line in f:
                if line.strip():
                    samples.append(json.loads(line))
        if tmp_fd is not None:
            _os.close(tmp_fd)
            _os.unlink(path)
        o = Oracle()
        fn = o.extract_mentions
        report = (lambda *_: None) if args.quiet else print
        if args.mode == "latency":
            stats = run_latency_mode(samples, fn, args.iterations,
                                     args.warmup, report=report)
        else:
            stats = run_throughput_mode(samples, fn, args.iterations,
                                        args.warmup, args.batch_size,
                                        args.concurrency, report=report)
        print(json.dumps(stats, indent=1))
        return 0

    if args.cmd == "run":
        _init_ray(args.num_cpus)
        import ray

        from .pipelines.kg import run_kg_pipeline

        summary = run_kg_pipeline(args.pages, args.out, labels=args.labels,
                                  resume=not args.no_resume,
                                  shard_size=args.shard_size,
                                  link=not args.no_link)
        print(json.dumps(summary, indent=1))
        ray.shutdown()
        return 0

    if args.cmd == "synth":
        _init_ray(args.num_cpus)
        import ray

        from .sources.pages import write_pages_parquet

        write_pages_parquet(args.sf_dir, args.out, repeat=args.repeat,
                            num_files=args.files)
        print(json.dumps({"out": args.out, "repeat": args.repeat}))
        ray.shutdown()
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
