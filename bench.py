#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output protocol (the driver reads the LAST line): the compact headline
object `{"metric", "value", "unit", "queries", "sf"}` is printed
FLUSHED immediately after the headline tier completes (insurance
against an external kill), auxiliary tiers are each printed as their
own `{"tier": ...}` JSON line as they complete, and the SAME headline
object is printed again as the FINAL line.  Round 6 lesson
(BENCH_r06 `rc: 124, parsed: null`): the suite outgrew the driver's
time budget and the kill landed before the headline ever printed — so
the whole run is now DEADLINE-BOXED ($SPARK_GRAFT_BENCH_BUDGET_SEC,
default 2400 s ≈ 80% of the last rc-0 round's runtime), checked
between queries/chunks so every tier partial-emits instead of dying,
and a SIGTERM handler re-prints the headline before exiting.  The
full combined object is also written to `bench_full.json` for audit.

Isolation model (round-6 lesson #2): running ~100 extended queries in
ONE JVM inflated the tail numbers 3-25x vs isolated reruns (driver
recorded knn_lsh 21.0 s / adamic 28.4 s where fresh-process medians
are 0.87 s / 7.2 s — JIT-code-cache pressure, ContextCleaner debt,
heap fragmentation; see BASELINE.md "bench methodology").  The
extended and sf1 tiers therefore run in per-chunk SUBPROCESS workers
(`bench.py --worker`, ≤12 queries per fresh JVM, driver GC between
heavy queries inside a chunk).  DuckDB yardsticks are OFF by default
in driver runs (in-bench DuckDB numbers were declared contaminated
and non-authoritative in BASELINE.md; isolated yardsticks live in
tools/*_yardstick.py) — re-enable locally with SPARK_GRAFT_DUCKDB=1.

Round-8 harness changes (r7 lessons; timed regions and the headline
tier protocol are UNCHANGED): (1) the heaviest extended queries run
first in chunks of 3 (r7's driver artifact read link_prediction at
44.6 s inside a shared 12-query JVM vs 4.2 s isolated); (2) the sf1
tier synthesizes its data in a dedicated pre-step worker and runs
chunks of 3 under per-chunk budget caps (r7 emitted only 6/17 sf1
queries — one uncapped chunk consumed the tier); (3) the
minhash_verified throughput probe is opt-in
(SPARK_GRAFT_SCALING_PROBE=1); (4) the sf1 DuckDB yardstick is
skipped when synthesis didn't run (it would silently time sf0.1 data
as sf1); (5) the headline-tier JVM defaults to a 4g heap and worker
JVMs to 12g — measured same-epoch A/B on this host class (fresh
pages fault slowly): headline total 3.6-4.0 s at 4g vs 6.4-7.4 s at
12g, while the wedge workers regress below 12g. SPARK_GRAFT_MEM
overrides both.

Queries mirror BASELINE.md's workload table:
  B1 keyed windowed fold  -> daily_value_by_type (fold_window)
  B2 1BRC grouped agg     -> reduce_minmax_price (reduce_final)
  B3 wordcount            -> wordcount (flat_map + count_final)
  B4 keyed join           -> join_product_customer_orders (join)
  B5 tumbling count       -> hourly_event_counts (count_window)
plus the flagship q1_pricing_summary.

Each query is materialized through the noop sink (computes every
column, writes nothing) — measures engine time, not collect/driver
transfer.

Measurement model: PLAN ONCE, EXECUTE PER REP. Warm reps re-execute a
DataFrame constructed once per query — matching the reference engine,
which builds its dataflow graph once and streams batches through it.
Catalyst's optimizer + physical planner still run on every rep (each
``df.write`` wraps the plan in a fresh command); what's amortized is
the Python-side DSL construction + analysis, which is driver-side
setup, not engine throughput, and would be a one-time cost on any
long-lived cluster job. Cold numbers include construction.
"""

from __future__ import annotations

import json
import os
import re
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "reduce_minmax_price",
    "wordcount",
    "join_product_customer_orders",
    "join_last_order_lineitem",
    "hourly_event_counts",
    "daily_value_by_type",
    "sliding_2h_user_counts",
    "session_windows_30m",
    "cumulative_value_per_user",
]

_START = time.monotonic()

# Heap policy (r8, guide §5 + measured): the HEADLINE tier runs 13
# sub-second sf0.1 aggregations — its working set is far below 1 GB,
# and on this host class freshly-touched pages fault in slowly (the
# host reclaims backing between runs), so a big heap makes G1 wander
# into unbacked pages mid-query: measured same-epoch A/B at sf0.1,
# headline total 12g 6.4-7.4 s vs 4g 3.6-4.0 s, q1 median 2.4 s vs
# 0.62 s. Worker tiers keep 12g — their aggregation state needs the
# room (wedge chunk A/B: 12g 3.1/2.6 s vs 6g 3.7/4.5 s warm). An
# explicit SPARK_GRAFT_MEM wins everywhere, so cluster users see no
# behavior change.
_USER_MEM = os.environ.get("SPARK_GRAFT_MEM")
HEADLINE_MEM = _USER_MEM or "4g"
WORKER_MEM = _USER_MEM or "12g"


def _budget() -> float:
    return float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_SEC", "2400"))


def _remaining() -> float:
    return _budget() - (time.monotonic() - _START)


def _warm_tables(spark, sf_dir: str) -> None:
    """One count per table: footer read, codegen, Arrow init — so
    timings measure query compute, not one-time JVM/file-index setup."""
    from bytewax_spark.io import read_parquet

    for t in ("lineitem", "orders", "customer", "events", "documents", "embeddings"):
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            read_parquet(spark, path).count()


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _jvm_gc(spark) -> None:
    # heavy reps leave GBs of dereferenced shuffle files that the
    # ContextCleaner only reaps after a driver GC (default periodicGC
    # is 30 min — longer than a tier); force one so query N's garbage
    # can't contaminate query N+1's timings
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass


# ---------------------------------------------------------------- worker

def _worker() -> None:
    """Subprocess entry: fresh JVM runs a small chunk of queries and
    prints `RESULT {json}` as its last stdout line.  stdin carries
    `{kind, sf_dir, names, budget_sec}`."""
    spec = json.loads(sys.stdin.read())
    sf_dir = spec["sf_dir"]
    names = spec["names"]
    w_deadline = time.monotonic() + float(spec.get("budget_sec", 600))

    import __spark_entry__ as e
    from bytewax_spark.session import get_spark

    spark = get_spark("bench-worker")
    spark.range(1).count()

    out: dict = {"queries": {}, "queries_cold": {}, "skipped": []}

    if spec["kind"] == "sf1":
        from tools import baseline_sim, make_benchdata

        sf1_dir = make_benchdata.ensure(spark, src_dir=sf_dir)
        out["dir"] = sf1_dir
        run_dir = sf1_dir
    else:
        run_dir = sf_dir
    if names:  # the sf1 synthesis pre-step ships no queries
        _warm_tables(spark, run_dir)

    qs = e.queries()
    for name in names:
        if time.monotonic() > w_deadline:
            out["skipped"].append(name)
            continue
        fn = qs[name]
        # prepared-plan model (see module docstring): build once —
        # run 1 = cold, includes construction + codegen + AQE replan —
        # then MIN of the warm re-executions.  A single warm rep is
        # contaminated by the C2 JIT tail on this box (isolated runs
        # converge only after 3-4 reps: e.g. [12.1, 8.5, 7.2, 7.3,
        # 7.9] — BASELINE.md r6), so min-of-3 is the cheapest robust
        # steady-state estimator; queries whose cold run is already
        # heavy (>15 s) get min-of-2 to keep the tier bounded.
        t0 = time.time()
        df = fn(spark, run_dir)
        _noop(df)
        cold = time.time() - t0
        out["queries_cold"][name] = round(cold, 3)
        # very heavy queries (cold > 60 s, the sf1 join shapes) get ONE
        # warm rep: at that magnitude the JIT tail is proportionally
        # negligible, and the second rep's 1-4 min would otherwise
        # deadline-shed the rest of the tier (r7 12g run: minhash_lsh
        # sf1 alone consumed the reserve and 5 queries were skipped)
        reps = 3 if cold < 15.0 else (2 if cold < 60.0 else 1)
        best = float("inf")
        for _ in range(reps):
            if best < float("inf") and time.monotonic() > w_deadline:
                break
            # heavy queries leave multi-GB of dereferenced shuffle/agg
            # garbage per rep; without a collection the NEXT rep runs
            # against a near-full old gen and measures GC churn, not
            # the query (measured r7: link_prediction 12-50 s/rep
            # dirty vs 6.5-8 s steady with a collection between reps
            # — the same debt-control the isolated yardsticks apply
            # between processes)
            if cold > 5.0:
                _jvm_gc(spark)
            t0 = time.time()
            _noop(df)
            best = min(best, time.time() - t0)
        out["queries"][name] = round(best, 3)
        # incremental emit: if the backstop kills this worker mid-query
        # (a cold run is not deadline-interruptible), the parent keeps
        # every query that already finished instead of skipping the
        # whole chunk
        print("PARTIAL " + json.dumps(out), flush=True)
        if cold > 1.0:
            _jvm_gc(spark)

    if spec["kind"] == "sf1":
        # minhash_verified_pairs_docs has NO DuckDB yardstick at sf1
        # (its oracle's shingle join exceeds the 20 GB temp cap), and
        # its true output grows superlinearly there by construction:
        # the key-shifted 10x corpus multiplies near-dup PAIRS, not
        # docs. So scaling is judged on verified-pairs THROUGHPUT —
        # output pairs per second at each scale — where linear-in-
        # output shows up as a flat-or-rising rate.
        # the throughput probe re-counts the pair outputs at both
        # scales — minutes of extra work that starved r7's driver tier;
        # local audits opt back in with SPARK_GRAFT_SCALING_PROBE=1
        mv = "minhash_verified_pairs_docs"
        probe_on = os.environ.get("SPARK_GRAFT_SCALING_PROBE", "0") == "1"
        if probe_on and mv in out["queries"] and out["queries"][mv] > 0 and time.monotonic() < w_deadline:
            n1 = qs[mv](spark, run_dir).count()
            n01 = qs[mv](spark, sf_dir).count()
            out["minhash_verified_scaling"] = {
                "sf01_pairs": n01,
                "sf1_pairs": n1,
                "sf1_sec": out["queries"][mv],
                "sf1_pairs_per_sec": round(n1 / out["queries"][mv], 1),
            }
        # the pyloop floor belongs to the B-workload chunk; with the
        # tier chunked per JVM, run it exactly once there
        if "wordcount" in names and time.monotonic() < w_deadline:
            out["pyloop_lower_bound"] = baseline_sim.run_all(run_dir)

    print("RESULT " + json.dumps(out), flush=True)


def _run_chunk(kind: str, sf_dir: str, names: list[str], budget_sec: float) -> dict:
    """Run one worker subprocess; on any failure return its names as
    skipped so the tier still partial-emits."""
    spec = json.dumps(
        {"kind": kind, "sf_dir": sf_dir, "names": names, "budget_sec": budget_sec}
    )
    t0 = time.monotonic()
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker"],
            input=spec,
            capture_output=True,
            text=True,
            timeout=budget_sec + 120,  # worker self-boxes; this is the backstop
            env={**os.environ, "SPARK_GRAFT_MEM": WORKER_MEM},
        )
        res = _last_result(proc.stdout)
        if res is not None:
            # breadcrumb for budget audits: which chunk spent what
            print(
                f"chunk {kind}[{names[0] if names else 'synthesis'}"
                f"+{max(0, len(names) - 1)}] done in "
                f"{time.monotonic() - t0:.0f}s (cap {budget_sec:.0f}s)",
                file=sys.stderr,
            )
            res.setdefault("skipped", []).extend(
                n for n in names if n not in res.get("queries", {})
                and n not in res["skipped"]
            )
            return res
        print(
            f"bench worker ({kind}) produced no RESULT line rc={proc.returncode}: "
            + proc.stderr[-500:],
            file=sys.stderr,
        )
    except subprocess.TimeoutExpired as exc:
        # the backstop killed the worker mid-query; keep every query
        # that already finished (workers emit PARTIAL after each one)
        print(f"bench worker ({kind}) hit the backstop: {exc}", file=sys.stderr)
        res = _last_result(exc.stdout or "")
        if res is not None:
            res.setdefault("skipped", []).extend(
                n for n in names if n not in res.get("queries", {})
                and n not in res["skipped"]
            )
            return res
    except Exception as exc:
        print(f"bench worker ({kind}) failed: {exc}", file=sys.stderr)
    return {"queries": {}, "queries_cold": {}, "skipped": list(names)}


def _last_result(stdout) -> dict | None:
    """Newest RESULT/PARTIAL json line from a worker's stdout, if any."""
    if isinstance(stdout, bytes):
        stdout = stdout.decode("utf-8", "replace")
    for line in reversed(stdout.splitlines()):
        for prefix in ("RESULT ", "PARTIAL "):
            if line.startswith(prefix):
                try:
                    return json.loads(line[len(prefix):])
                except ValueError:
                    return None
    return None


# ------------------------------------------------------------------ main

def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    import __spark_entry__ as e
    from bytewax_spark.session import get_spark

    os.environ["SPARK_GRAFT_MEM"] = HEADLINE_MEM  # heap policy note above
    spark = get_spark("bench")
    spark.range(1).count()  # JVM warm
    _warm_tables(spark, sf_dir)

    qs = e.queries()
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = qs[name]
        # PLAN ONCE, EXECUTE PER REP (module docstring): cold run 1
        # includes construction; the MEDIAN of 5 warm reps is robust
        # to transient host contention (driver-run rounds showed
        # uniform 1.3-1.7x inflation vs committed snapshots — medians
        # separate environment noise from real regressions).
        t0 = time.time()
        df = fn(spark, sf_dir)
        _noop(df)
        cold[name] = round(time.time() - t0, 3)
        warm: list[float] = []
        for _ in range(5):
            t0 = time.time()
            _noop(df)
            warm.append(time.time() - t0)
        timings[name] = round(sorted(warm)[len(warm) // 2], 3)

    total = round(sum(timings.values()), 3)
    headline = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    headline_line = json.dumps(headline)
    # the headline is the artifact the driver grades on — print it the
    # moment it exists (r6 lost it to a timeout), and re-print it on
    # SIGTERM so even a killed run's stdout tail carries it.
    print(headline_line, flush=True)

    def _on_term(signum, frame):  # noqa: ANN001
        print(headline_line, flush=True)
        os._exit(0)

    signal.signal(signal.SIGTERM, _on_term)

    aux: dict[str, dict] = {}

    def _emit_tier(name: str, tier: dict) -> None:
        # print each auxiliary tier AS SOON as it completes (flushed):
        # a crash in a later tier must not lose earlier measurements
        aux[name] = tier
        print(json.dumps({"tier": name, **tier}), flush=True)

    _emit_tier("cold", {"queries_cold": cold})

    # parent's session is only needed for the headline tier; the aux
    # tiers run in fresh worker JVMs (isolation model, module
    # docstring), so release the parent heap before spawning them.
    spark.stop()

    duckdb_on = os.environ.get("SPARK_GRAFT_DUCKDB", "0") == "1"

    # --- extended tier: beyond-reference operators (dedup, similarity,
    # sampling, curation) and the newer TPC-H shapes, in chunks of <=12
    # per fresh JVM. Separate dict so the headline total stays
    # comparable across rounds. Disable with SPARK_GRAFT_EXTENDED=0.
    if os.environ.get("SPARK_GRAFT_EXTENDED", "1") != "0":
        ext: dict[str, float] = {}
        ext_cold: dict[str, float] = {}
        skipped: list[str] = []
        # heavy queries run FIRST in their own small chunks (r8): a
        # JVM's heap high-water is set by its heaviest resident query,
        # and on this host class grown-then-reclaimed pages punish
        # every later query in the same worker (r7 driver artifact:
        # link_prediction 44.6 s inside a 12-query chunk vs 4.2 s
        # isolated, same code). Small chunks bound the blast radius;
        # running them first spends budget on the graded regression
        # targets before the cheap tail.
        chunks = [
            EXTENDED_HEAVY[i : i + 3] for i in range(0, len(EXTENDED_HEAVY), 3)
        ]
        rest = [q for q in EXTENDED_QUERIES if q not in set(EXTENDED_HEAVY)]
        chunks += [rest[i : i + 12] for i in range(0, len(rest), 12)]
        for chunk in chunks:
            # reserve ~10 min for the sf1 tier + final emit; a chunk
            # that can't get at least 90 s just partial-skips
            rem = _remaining() - 600
            if rem < 90:
                skipped.extend(chunk)
                continue
            res = _run_chunk("extended", sf_dir, chunk, min(rem, 420))
            ext.update(res.get("queries", {}))
            ext_cold.update(res.get("queries_cold", {}))
            skipped.extend(res.get("skipped", []))
        tier: dict = {"queries": ext, "queries_cold": ext_cold}
        if skipped:
            tier["deadline_skipped"] = skipped
        if duckdb_on:
            tier["duckdb"] = _duckdb_times(e.oracle_sql(), sf_dir, EXTENDED_QUERIES)
        _emit_tier("extended", tier)

    # --- sf1 tier: 10x key-shifted data, where the ~0.3 s/stage
    # scheduling floor amortizes and per-row throughput dominates.
    # The pure-Python per-item loop (= strict lower bound on the
    # reference engine) is measured at the SAME scale in the same
    # worker. Disable with SPARK_GRAFT_SF1=0.
    if os.environ.get("SPARK_GRAFT_SF1", "1") != "0":
        # per-chunk fresh JVMs, like the extended tier: a 17-query
        # marathon in one JVM re-creates the contamination this bench
        # exists to avoid (r7: minhash_lsh sf1 read 132 s in the
        # marathon vs 46 s isolated on the same box — the host
        # overcommit punishes a JVM whose footprint has grown).
        # r8 (r7 lesson: the tier emitted only 6/17 queries — one
        # uncapped chunk ate the budget): chunks of 3 with a PER-CHUNK
        # cap sized from the remaining budget and remaining chunks, and
        # the one-time sf1 synthesis runs in its OWN pre-step worker
        # (marker-cached for the chunks) so a synthesis overrun can't
        # consume a query chunk's cap.
        SF1_CHUNK = 3
        tier = {"queries": {}, "queries_cold": {}}
        sf1_skipped: list[str] = []
        chunks = [
            SF1_QUERIES[i : i + SF1_CHUNK]
            for i in range(0, len(SF1_QUERIES), SF1_CHUNK)
        ]
        pre = _run_chunk("sf1", sf_dir, [], min(max(_remaining() - 300, 60), 600))
        if "dir" in pre:
            tier["dir"] = pre["dir"]
        # a pre-step overrun is non-fatal: chunk workers each call
        # ensure() themselves (marker-idempotent), so the first chunk
        # simply pays whatever synthesis remains
        for ci, chunk in enumerate(chunks):
            rem = _remaining() - 30
            if rem < 90:
                sf1_skipped.extend(q for c in chunks[ci:] for q in c)
                break
            # fair share of what's left across remaining chunks, with
            # headroom to absorb one slow chunk without starving the
            # rest (mirrors the extended tier's cap)
            cap = max(120.0, 1.5 * rem / (len(chunks) - ci))
            res = _run_chunk("sf1", sf_dir, chunk, min(rem, cap))
            for k in ("queries", "queries_cold"):
                tier[k].update(res.get(k, {}))
            for k in ("dir", "minhash_verified_scaling", "pyloop_lower_bound"):
                if k in res:
                    tier[k] = res[k]
            sf1_skipped.extend(res.get("skipped", []))
        if sf1_skipped:
            tier["deadline_skipped"] = sf1_skipped
        # DuckDB yardstick only when the sf1 data actually exists —
        # falling back to sf_dir would time sf0.1 oracles and record
        # them as sf1 (a 10x mislabel in the audit artifact)
        if duckdb_on and "dir" in tier:
            tier["duckdb"] = _duckdb_times(
                e.oracle_sql(), tier["dir"], SF1_QUERIES, large_sf=True
            )
        _emit_tier("sf1", tier)

    # tiers were printed as they completed; compact headline LAST so a
    # tail-truncating reader still gets a parseable headline object.
    full = dict(headline)
    full.update({k: v for k, v in aux.items()})
    try:
        with open(os.path.join(REPO, "bench_full.json"), "w") as f:
            json.dump(full, f, indent=1)
    except OSError:
        pass  # read-only checkout: stdout lines still carry everything
    print(headline_line, flush=True)


SF1_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "reduce_minmax_price",
    "wordcount",
    "join_last_order_lineitem",
    "hourly_event_counts",
    "daily_value_by_type",
    # LLM-pipeline shapes at 10x: show the sf0.1 stage floor
    # amortizing on the ops that matter most at corpus scale
    "dedup_fingerprint_docs",
    "minhash_lsh_pairs_docs",
    "lsh_cosine_neardup_pairs",  # r7 Arrow bucket kernel at 10x vectors
    "curate_corpus",
    # heavy join-shaped queries with non-trivial scaling exponents —
    # the sf0.1->sf1 ratio is the scale-robustness datum (see
    # BASELINE.md "Scaling of the heavy joins"); LAST so a deadline
    # partial-skip sheds the heaviest work first
    "span_dedup_docs",
    "adamic_adar_parts",
    "containment_pairs_docs",
    "minhash_verified_pairs_docs",
]

# The tier's heaviest residents (r7 driver artifact + r8 measurements:
# multi-second warm or >8 s cold) — run FIRST, in chunks of 3, so one
# query's heap high-water never taxes nine cheap neighbors and the
# graded regression targets get budget before the tail.
EXTENDED_HEAVY = [
    "link_prediction_parts",
    "adamic_adar_parts",
    "containment_pairs_docs",
    "triangle_counts_copart",
    "clustering_coefficient_parts",
    "modularity_label_prop_parts",
    "minhash_verified_pairs_docs",
    "simhash_neighbor_pairs_docs",
    "image_neardup_pairs_docs",
]

EXTENDED_QUERIES = [
    "q10_returned_revenue",
    "q12_priority_by_status",
    "q14_promo_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "dedup_fingerprint_docs",
    "minhash_lsh_pairs_docs",
    "lsh_cosine_neardup_pairs",
    "lsh_cosine_multiprobe_pairs",
    "sample_docs_10pct",
    "curate_corpus",
    # the newest beyond-reference operators — exactly where perf
    # regressions will hide (iterative CC, prefix-sum packing,
    # two-phase capped rank, range-sort head)
    "neardup_clusters_docs",
    "pack_sequences_docs",
    "cap_docs_per_source",
    "corpus_shuffle_head",
    # round-3 additions: incremental near-dup, int8 quantization,
    # z-order key, real media decode, avro wire, space-saving sketch
    "minhash_incremental_docs",
    "quantized_embeddings_int8",
    "zorder_docs_layout",
    "multimodal_image_decode",
    "avro_registry_resolve_docs",
    "space_saving_topk_users",
    # retrieval/curation surface: Bloom incremental dedup, verified
    # MinHash, SemDeDup, DSIR weights, TF-IDF/BM25, chunking
    "span_dedup_docs",
    "perplexity_docs",
    "winnow_fingerprints_docs",
    "bloom_dedup_incremental_docs",
    "minhash_verified_pairs_docs",
    "semdedup_docs",
    "dsir_weights_docs",
    "tfidf_top_terms_docs",
    "bm25_search_docs",
    "chunk_docs_32",
    # graph analytics + sampling/calibration additions: fixed-point
    # PageRank, degree-ordered triangles, A-ES weighted sampling,
    # alpha-mixture, per-source percentile calibration, vocab coverage
    "pagerank_purchase_graph",
    "triangle_counts_copart",
    "sample_weighted_100_docs",
    "temperature_mixture_docs",
    "pct_nchars_by_source_docs",
    "vocab_coverage_docs",
    # sketch + text-analysis additions: count-min, HLL (direct and
    # shard-merged), PMI collocations, char-entropy quality signal
    "countmin_sketch_users",
    "hll_estimate_users",
    "hll_merge_sources_docs",
    "pmi_collocations_docs",
    "char_entropy_docs",
    # behavioral/linkage/CDC/sketch additions: ordered funnel, k-core
    # peel, blocked fuzzy self-join, max_by snapshot, Bloom membership
    "funnel_view_click_purchase",
    "kcore_copart",
    "fuzzy_name_pairs_customers",
    "latest_event_per_user",
    "bloom_membership_users",
    # ML-prep / analytics / containment additions
    "session_counts_per_user",
    "scd2_user_event_versions",
    "equi_depth_bins_events",
    "zscore_event_values",
    "negative_samples_customer_parts",
    "winsorized_mean_by_type",
    "auc_purchase_by_source",
    "curriculum_bands_docs",
    "containment_pairs_docs",
    # capped link prediction (max_degree=128 wedge cap + pinned wedge
    # -join parallelism)
    "link_prediction_parts",
    "adamic_adar_parts",
    # round-5 additions: mergeable moments sketch (batch + stream-in-
    # batch), NB classifier train+score, inverted index, keep-best
    # dedup, SimHash hamming pairs, text normalization, DQ gates, BPE
    # round-0 statistics
    "moments_sketch_value_events",
    "moments_stream_batch_by_type",
    "nb_score_lang_docs",
    "inverted_index_docs",
    "dedup_keep_best_docs",
    "simhash_neighbor_pairs_docs",
    "normalize_text_docs",
    "dq_report_orders",
    "bpe_pair_counts_docs",
    # round-5 session additions: fixed-point HITS + weighted PageRank,
    # hybrid-search fusion, kNN label QA, EWMA fold, Bloom runtime
    # filter, CDC MERGE apply, drift stats, checksums, sessions
    "hits_purchase_graph",
    "wpagerank_purchase_graph",
    "rrf_hybrid_search_docs",
    "knn_label_agreement_embeddings",
    "knn_label_agreement_lsh_embeddings",
    "ewma_value_by_user",
    "bloom_semijoin_lineitem",
    "apply_upserts_events",
    "psi_click_purchase_value",
    "ks_click_purchase_value",
    "mi_lang_source_docs",
    "table_checksum_lineitem",
    "session_conversion_events",
    "cusum_value_by_type",
    "benford_extendedprice",
    "gini_value_by_type",
    "readability_docs",
    "pareto_suppliers_revenue",
    "mad_outliers_events",
    "event_trigrams_users",
    "cumulative_distinct_users_daily",
    "funnel_within_hour",
    "vwap_monthly_lineitem",
    "feature_prop_acctbal",
    "k_anonymity_customers",
    "balanced_downsample_docs",
    "rfm_segments_users",
    "session_paths_events",
    "image_ahash_docs",
    "image_neardup_pairs_docs",
    "holt_value_by_user",
    "seasonal_index_hourly",
    "modularity_label_prop_parts",
    "clustering_coefficient_parts",
    "nb_confusion_lang_docs",
    "gapfill_interp_user_hourly",
    "stratified_split_docs",
    "entropy_event_types_by_user_band",
    "asof_tolerance_click_purchase",
]

_DUCKDB_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# oracles that are correctness artifacts, not fair yardsticks: the CC
# oracle is a RECURSIVE reachability CTE (single-threaded, minutes at
# sf0.1 vs Spark's O(diameter) label propagation) — timing it would
# stall the bench run, so the Spark timing stands alone.
# containment's oracle is the NAIVE shingle self-join (fine at the
# sf0.01 gate; quadratic on hot shingles at sf0.1) — the Spark side
# runs the prefix-filtered exact algorithm and stands alone.
_DUCKDB_SKIP = {
    "neardup_clusters_docs",
    "containment_pairs_docs",
    # embeds the same recursive reachability CTE as neardup_clusters
    "dedup_keep_best_docs",
}

# additionally skipped at sf >= 1: the wedge-join oracles materialize
# ~2e9 intermediate rows there (the capped part co-occurrence graph has
# ~20M directed edges x ~115 avg capped degree) — a measured DuckDB
# run spilled >79 GB of temp and filled the disk. The Spark timing
# stands alone at that scale; the sf0.1 extended tier still carries the
# DuckDB yardstick for these.
_DUCKDB_SKIP_LARGE = {
    "adamic_adar_parts",
    "link_prediction_parts",
    # its shingle-join oracle exceeds the 20 GB temp cap at sf1 (was a
    # -1.0 row); the sf1 tier instead reports verified-pairs
    # THROUGHPUT vs the sf0.1 rate ("minhash_verified_scaling")
    "minhash_verified_pairs_docs",
}


def _duckdb_times(
    oracles: dict[str, str], sf_dir: str, names: list[str], large_sf: bool = False
) -> dict[str, float]:
    """DuckDB wall time for each bench query's oracle SQL over the same
    parquet files (32 threads, results materialized). OPT-IN
    (SPARK_GRAFT_DUCKDB=1, local audits only): in-bench DuckDB numbers
    share the run's page cache and CPU with Spark's leftovers and were
    declared contaminated/non-authoritative in BASELINE.md — the
    committed yardsticks come from tools/*_yardstick.py isolated runs.
    Resource-capped and fault-isolated: one pathological oracle must
    not take down the whole bench run (an uncapped sf1 wedge oracle
    once spilled >79 GB of temp and crashed the host's disk)."""
    import duckdb

    con = duckdb.connect()
    con.execute("SET threads TO 32")
    con.execute("SET memory_limit = '48GB'")
    con.execute("SET max_temp_directory_size = '20GB'")
    for t in _DUCKDB_TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}/*.parquet')"
                if os.path.isdir(path)
                else f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    times: dict[str, float] = {}
    for name in names:
        sql = oracles.get(name)
        if not sql or name in _DUCKDB_SKIP:
            continue
        if large_sf and name in _DUCKDB_SKIP_LARGE:
            continue
        # cheap oracles get a warm-up run and the SECOND run is timed
        # (a cold first run inflates the yardstick, biasing speedup
        # claims in the engine's favor); known-slow oracles (>10 s —
        # the sf1 minhash alone is ~6 min/run) are timed single-run to
        # keep bench wall time bounded.
        try:
            t0 = time.time()
            con.execute(sql).fetchall()
            dt = time.time() - t0
            if dt < 10.0:
                t0 = time.time()
                con.execute(sql).fetchall()
                dt = min(dt, time.time() - t0)
            times[name] = round(dt, 3)
        except Exception as exc:  # resource cap hit: record, move on
            print(f"duckdb oracle {name} failed: {exc}", file=sys.stderr)
            times[name] = -1.0
    con.close()
    return times


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        _worker()
    else:
        main()
