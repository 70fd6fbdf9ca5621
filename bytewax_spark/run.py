"""Execution entry points (reference ``pysrc/bytewax/run.py`` CLI and
``bytewax.testing.run_main``).

``run_main(flow)`` executes every queued sink: batch streams write
immediately (``df.write`` / sink callback); streaming streams start a
``writeStream`` query per sink (availableNow by default — one
deterministic drain, the analog of the reference's single-worker test
entry point) and await termination.

CLI: ``python -m bytewax_spark.run mymodule:flow [--checkpoint DIR]``.
Recovery/resume (reference SQLite snapshots, ``src/recovery.rs``) is
Structured Streaming checkpointing — pass ``--checkpoint`` and restart
the same command to resume from the last committed micro-batch.
"""

from __future__ import annotations

import argparse
import importlib
import sys
from typing import Any

from bytewax_spark.dataflow import Dataflow

__all__ = ["run_main", "cli_main"]


def run_main(flow: Dataflow, checkpoint: str | None = None, **trigger: Any) -> None:
    """Execute all sinks queued on the flow (one pass, deterministic).

    When ``BYTEWAX_DATAFLOW_API_ENABLED`` is set, a daemon-thread HTTP
    server exposes ``/dataflow`` + ``/metrics`` for the duration of the
    run (reference ``src/run.rs:368-372``; see
    :mod:`bytewax_spark.webserver`)."""
    if not flow.sinks:
        raise ValueError(f"flow {flow.flow_id!r} has no outputs; add op.output(...)")
    from bytewax_spark.webserver import maybe_serve_dataflow_api

    server = maybe_serve_dataflow_api(flow)
    try:
        queries = []
        for _sid, stream, sink in flow.sinks:
            if stream.is_streaming:
                q = sink.write_stream(stream.df, checkpoint=checkpoint, **trigger)
                queries.append(q)
            else:
                sink.write_batch(stream.df)
        for q in queries:
            q.awaitTermination()
    finally:
        if server is not None:
            server.shutdown()


def _locate_flow(spec: str) -> Dataflow:
    """Import ``module:attr`` → Dataflow (reference ``run.py:30-117``)."""
    mod_name, _, attr = spec.partition(":")
    # Flow modules build their Dataflow eagerly at import time; any
    # UDF-backed operator they call pickles its callback right then.
    # Register the module for pickle-by-VALUE before its body runs, or
    # executors deserializing a module-level callback would re-import
    # the module — re-running flow construction on a worker and hitting
    # SPARK-5063 (SparkContext only valid on the driver).
    from pyspark import cloudpickle

    mod = sys.modules.get(mod_name)
    if mod is None:
        modspec = importlib.util.find_spec(mod_name)
        if modspec is None:
            raise ModuleNotFoundError(f"No module named {mod_name!r}")
        mod = importlib.util.module_from_spec(modspec)
        sys.modules[mod_name] = mod
        cloudpickle.register_pickle_by_value(mod)
        try:
            modspec.loader.exec_module(mod)
        except BaseException:
            del sys.modules[mod_name]
            raise
    else:
        cloudpickle.register_pickle_by_value(mod)
    obj = getattr(mod, attr or "flow")
    if callable(obj) and not isinstance(obj, Dataflow):
        obj = obj()
    if not isinstance(obj, Dataflow):
        raise TypeError(f"{spec!r} did not resolve to a Dataflow")
    return obj


def cli_main(argv: list[str] | None = None) -> None:
    """CLI with the reference's scaling/recovery surface
    (``pysrc/bytewax/run.py:197-247``) mapped to Spark's:

    - ``-w/--workers`` (reference workers-per-process) → local[N]
      parallelism / ``spark.sql.shuffle.partitions``.
    - ``--master`` (reference ``-i/-a`` process addresses) → the
      cluster manager URL; Spark places executors, so there is no
      per-process address list to pass.
    - ``-s/--snapshot-interval`` → the streaming trigger interval:
      micro-batch commit cadence IS the snapshot cadence (state goes
      to the checkpoint every batch).
    - ``-r/--checkpoint`` → checkpoint dir (reference recovery dir).
    """
    import os

    p = argparse.ArgumentParser(prog="python -m bytewax_spark.run")
    p.add_argument("import_str", help="module:flow (module importable on sys.path)")
    p.add_argument("--checkpoint", "-r", default=os.environ.get("BYTEWAX_SPARK_CHECKPOINT"),
                   help="checkpoint dir (recovery; env BYTEWAX_SPARK_CHECKPOINT)")
    p.add_argument("--workers", "-w", type=int, default=None,
                   help="parallelism (local[N] / shuffle partitions)")
    p.add_argument("--master", default=None, help="Spark master URL (default local[workers])")
    p.add_argument("--snapshot-interval", "-s", type=float, default=None,
                   help="streaming trigger (= snapshot/commit) interval, seconds; "
                        "default: one availableNow drain")
    p.add_argument("--mermaid", action="store_true", help="print the step DAG and exit")
    p.add_argument(
        "--explain",
        action="store_true",
        help="print each sink's optimized physical plan and exit (no execution)",
    )
    args = p.parse_args(argv)
    sys.path.insert(0, "")

    # Build the session BEFORE the flow module imports (sources call
    # get_spark lazily via getOrCreate, which reuses this one).
    if args.workers is not None:
        os.environ["SPARK_GRAFT_CPUS"] = str(args.workers)
    if args.workers is not None or args.master is not None:
        from bytewax_spark.session import get_spark

        get_spark(master=args.master)

    flow = _locate_flow(args.import_str)
    if args.mermaid:
        print(flow.to_mermaid())
        return
    if args.explain:
        if not flow.sinks:
            raise SystemExit("flow has no sinks to explain")
        for sid, stream, _sink in flow.sinks:
            print(f"== sink {sid} ==")
            stream.df.explain("formatted")
        return
    trigger: dict[str, Any] = {}
    if args.snapshot_interval is not None:
        trigger["processingTime"] = f"{args.snapshot_interval} seconds"
    run_main(flow, checkpoint=args.checkpoint, **trigger)


if __name__ == "__main__":
    cli_main()
