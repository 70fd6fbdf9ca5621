"""Dump .explain('formatted') for registered queries to plans/<tag>/.

Usage: python tools/plan_dump.py <tag> <suffix> [query ...]

Writes plans/<tag>/<query>_<suffix>.txt for each query (default: the
round-7 optimization target list). Driver-side only — builds the
DataFrame and formats the physical plan, executes nothing.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT = [
    "winnow_fingerprints_docs",
    "simhash_neighbor_pairs_docs",
    "link_prediction_parts",
    "adamic_adar_parts",
    "containment_pairs_docs",
    "minhash_verified_pairs_docs",
    "minhash_lsh_pairs_docs",
    "clustering_coefficient_parts",
    "triangle_counts_copart",
    "span_dedup_docs",
    "gapfill_interp_user_hourly",
    "curate_corpus",
    "image_neardup_pairs_docs",
    "char_entropy_docs",
    "rfm_segments_users",
    "bloom_semijoin_lineitem",
    "modularity_label_prop_parts",
    "q3_shipping_priority",
    "join_last_order_lineitem",
    "q1_pricing_summary",
    "q5_region_revenue",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r07"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as e
    from bytewax_spark.session import get_spark

    spark = get_spark("plan-dump")
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    qs = e.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {name}_{suffix}.txt ({txt.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
