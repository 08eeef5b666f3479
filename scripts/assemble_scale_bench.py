#!/usr/bin/env python3
"""Assemble the committed BENCH_SF1.json / BENCH_SF10.json artifacts
from three Bench runs' BENCH_FULL.json dumps:

  usage: assemble_scale_bench.py <sf1_full.json> <sf10_full.json> <sf01_full.json> <round>

sf1/sf10 are RUNS=1 full-inventory runs on /tmp/graft_sf1 (10x tiling)
and /tmp/graft_sf10 (100x tiling); sf01 is the round's final sf0.1
median-of-3 reference. Ratios are per-query scale factors vs sf0.1.
"""
import json, sys


def main():
    sf1p, sf10p, sf01p, rnd = sys.argv[1:5]
    sf1 = json.load(open(sf1p))
    sf10 = json.load(open(sf10p))
    sf01 = json.load(open(sf01p))
    r1, r10, r01 = sf1["queries"], sf10["queries"], sf01["queries"]

    def ratios(big):
        return {k: round(v / r01[k], 2) for k, v in sorted(big.items())
                if r01.get(k, 0) > 0 and v > 0}

    def fam(d, pred):
        return {k: v for k, v in d.items() if pred(k)}

    emb = lambda k: k.startswith("emb_")
    ann = lambda k: k in (
        "emb_ann_ivf", "emb_ann_ivf_two_level", "emb_ann_lsh", "emb_pq_topk",
        "emb_quantized_topk", "emb_ann_recall", "emb_ann_recall_tuned",
        "emb_cosine_topk", "emb_recall_curve", "emb_two_level_probe_curve",
        "emb_cell_recall", "emb_cell_recall_two_level",
        "emb_ivfpq_topk", "emb_ivfpq_topk_two_level", "emb_ivfpq_rerank_curve",
        "emb_index_build", "emb_index_append", "emb_index_delete",
        "emb_index_lifecycle_two_level", "emb_index_shard_merge",
        "emb_filtered_topk", "emb_filtered_topk_selective",
        "emb_filtered_recall", "emb_filtered_boost_curve",
        "emb_filtered_boost_curve_two_level",
        "emb_filtered_topk_adaptive",
        "st_ivfpq_serve", "st_ivfpq_serve_topk", "st_index_append",
        "st_index_delete")
    st = lambda k: k.startswith("st_")

    rat1, rat10 = ratios(r1), ratios(r10)
    out1 = {
        "what": (f"empirical 10x scale point, round {rnd}: sf1 = deterministic 10x tiling "
                 "of sf0.1 (graft.tools.ScaleUp; affine-cipher text + permutation/sign-flip "
                 "embeddings per replica). FULL surface at the FULL round inventory "
                 f"({len(r1)} queries incl. the round-10 two-level audit pair), 1 run each, "
                 "local[32], sorted-name order. Reference = the same round's final sf0.1 "
                 "run (median-of-3, full inventory)."),
        "totals": {
            "sf1_total_sec": round(sf1["value"], 1), "sf1_queries": len(r1),
            "sf1_failures": sf1["failures"],
            "sf01_reference_total_sec": round(sf01["value"], 1),
            "sf01_queries": len(r01),
            "overall_ratio_at_10x_data": round(sf1["value"] / sf01["value"], 2),
            "note": "sf1 is 1 run/query vs the reference's median-of-3, so per-query "
                    "ratios carry single-run noise on top of the true scaling",
        },
        "ann_search_family_ratio": fam(rat1, ann),
        "embedding_family_ratio": fam(rat1, emb),
        "streaming_family_ratio": fam(rat1, st),
        "sf1_seconds": dict(sorted(r1.items())),
        "sf01_seconds_reference": dict(sorted(r01.items())),
        "time_ratio_at_10x_data": rat1,
    }
    out10 = {
        "what": (f"empirical 100x scale point, round {rnd}: sf10 = deterministic 100x "
                 "tiling of sf0.1 via graft.tools.ScaleUp, ALL tables (events/orders "
                 "tiled to 10M/15M rows, 500k docs, 200k vectors). FULL SURFACE "
                 f"({len(r10)} queries — the r9 directive's stretch), 1 run each, "
                 "local[32]. Includes the ANN search family the index handover was "
                 "built for, and the round-10 two-level audit pair, on post-r9-fix "
                 "code (present-cells restriction, structural regime handover)."),
        "totals": {
            "sf10_total_sec": round(sf10["value"], 1), "sf10_queries": len(r10),
            "sf10_failures": sf10["failures"],
            "sf01_reference_total_sec": round(sf01["value"], 1),
            "overall_ratio_at_100x_data": round(sf10["value"] / sf01["value"], 2),
        },
        "ann_search_family_ratio": fam(rat10, ann),
        "embedding_family_ratio": fam(rat10, emb),
        "streaming_family_ratio": fam(rat10, st),
        "sf10_seconds": dict(sorted(r10.items())),
        "sf01_seconds_reference": dict(sorted(r01.items())),
        "time_ratio_at_100x_data": rat10,
    }
    json.dump(out1, open("BENCH_SF1.json", "w"), indent=1)
    json.dump(out10, open("BENCH_SF10.json", "w"), indent=1)
    over = {k: v for k, v in rat10.items() if v > 100}
    print("sf1 total", sf1["value"], "failures", sf1["failures"])
    print("sf10 total", sf10["value"], "failures", sf10["failures"])
    print("sf10 ratios >100x (superlinear):", json.dumps(over, indent=1))
    print("ann family @100x:", json.dumps(fam(rat10, ann), indent=1))


if __name__ == "__main__":
    main()
