#!/usr/bin/env python3
"""Generate the README cross-rung scaling table (VERDICT r13 #8).

Reads the four committed evidence files (BENCH_FULL.json = sf0.1,
BENCH_SF1/SF10/SF100.json) and emits a markdown table: one row per
family head, wall seconds at each measured rung, and the fitted
scaling exponent b of time ~ a * data^b (least-squares over the rungs
the query was measured at; data factors 1/10/100/1000 relative to
sf0.1). b = 1 is linear; b < 1 sub-linear (constants amortizing);
only queries with >= 2 measured rungs get an exponent.

Usage: python3 scripts/scaling_table.py [repo_root]
"""
import json, math, os, sys

root = sys.argv[1] if len(sys.argv) > 1 else "."
RUNGS = [("sf0.1", "BENCH_FULL.json", 1.0), ("sf1", "BENCH_SF1.json", 10.0),
         ("sf10", "BENCH_SF10.json", 100.0), ("sf100", "BENCH_SF100.json", 1000.0)]

# family head -> representative query (the family's heaviest oracled head)
FAMILIES = [
    ("scan + decimal agg", "q01_pricing_summary"),
    ("join + agg (TPC-H Q4 shape)", "q04_join_inner_agg"),
    ("exact dedup", "q60_dedup_exact"),
    ("near-dup Jaccard (exact→banded)", "q62_near_dup_jaccard"),
    ("MinHash LSH near-dup", "q71_minhash_lsh"),
    ("portable MinHash banding", "q220_minhash_portable"),
    ("LSH candidate pairs", "q225_lsh_candidate_pairs"),
    ("SemDeDup (chunk-bounded)", "q474_semdedup_scaled"),
    ("k-means recluster", "q477_kmeans_recluster"),
    ("embedding top-k", "q64_embedding_topk"),
    ("ANN bucketed search", "q90_ann_search"),
    ("ANN recall audit", "q226_ann_recall"),
    ("text stats (zipf)", "q139_zipf_stats"),
    ("token-grain PMI", "q176_bigram_pmi"),
    ("dedup ledger (incremental)", "q295_dedup_ledger"),
    ("causal screen P-grain", "q251_causal_screen"),
    ("training (minibatch BPTT)", "q121_train_minibatch"),
    ("training (full BPTT)", "q94_train_full"),
    ("streaming causal panel", "q357_stream_causal_panel"),
    ("streaming consensus", "q467_stream_consensus"),
    ("streaming timer sessions", "q197_stream_timer_sessions"),
    ("streaming media ingest", "q478_stream_wav_ingest"),
    ("multimodal byte kernels", "q85_multimodal_features"),
    ("WAV decode", "q476_wav_decode"),
    ("bootstrap CI (resample x200)", "q303_bootstrap_ci"),
    ("propensity strata (IRLS+rank)", "q395_propensity_strata"),
    ("ridge CV moment fold", "q363_ridge_cv"),
    ("triangle count", "q364_triangles"),
]

data = {}
for name, fn, factor in RUNGS:
    p = os.path.join(root, fn)
    if os.path.exists(p):
        data[name] = (json.load(open(p)), factor)

rows = []
for label, q in FAMILIES:
    cells, pts = [], []
    for name, fn, factor in RUNGS:
        if name not in data:
            cells.append("—"); continue
        d, f = data[name]
        t = d.get("queries", {}).get(q)
        if t is None:
            fmsg = d.get("failed", {}).get(q)
            cells.append("guard" if fmsg else "—")
        else:
            cells.append(f"{t:.2f}")
            pts.append((math.log10(f), math.log10(max(t, 1e-3))))
    if len(pts) >= 2:
        n = len(pts)
        sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts); sxy = sum(x * y for x, y in pts)
        b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        exp = f"{b:.2f}"
    else:
        exp = "—"
    rows.append((label, q, cells, exp))

print("| family head | query | sf0.1 (s) | sf1 (s) | sf10 (s) | sf100 (s) | fitted exponent |")
print("|---|---|---|---|---|---|---|")
for label, q, cells, exp in rows:
    print(f"| {label} | `{q}` | " + " | ".join(cells) + f" | {exp} |")

tot = []
for name, fn, factor in RUNGS:
    if name in data:
        d, _ = data[name]
        tot.append(f"{name}: {d['value']:.1f} s / {d['n']} queries ({d['n_failed']} failed)")
print()
print("Totals — " + "; ".join(tot))
