"""Epoch wall-clock for candidate flagship configs via the REAL bench path
(fused 25-epoch blocks, full workload). Decides what bench.py ships."""
import json, os, sys
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
import bench

CONFIGS = [
    ("baseline",        dict()),
    ("pallas_enc",      dict(pallas_encoder=True)),
    ("unroll49",        dict(unroll=49)),
    ("stride2",         dict(interp_stride=2)),
    ("stride2+unroll",  dict(interp_stride=2, unroll=24)),
]
if len(sys.argv) > 1 and sys.argv[1] == "final":
    # first measured config in a process is systematically inflated
    # (tunnel warm-up) -> discard a warmup run, then interleave repeats
    CONFIGS = [
        ("warmup_discard",      dict(unroll=49)),
        ("unroll49_a",          dict(unroll=49)),
        ("pallas_enc+unroll49", dict(pallas_encoder=True, unroll=49)),
        ("unroll7",             dict(unroll=7)),
        ("unroll49_b",          dict(unroll=49)),
    ]
elif len(sys.argv) > 1 and sys.argv[1] == "enc":
    # encoder-scan unroll on top of the shipped solver unroll=49
    CONFIGS = [
        ("warmup_discard",  dict(unroll=49)),
        ("solver_only",     dict(unroll=49)),
        ("enc7",            dict(unroll=49, encoder_unroll=7)),
        ("enc25",           dict(unroll=49, encoder_unroll=25)),
        ("enc50",           dict(unroll=49, encoder_unroll=50)),
        ("solver_only_rep", dict(unroll=49)),
    ]
elif len(sys.argv) > 1 and sys.argv[1] == "combos":
    CONFIGS = [
        ("unroll49_rep",       dict(unroll=49)),
        ("unroll7",            dict(unroll=7)),
        ("pallas_enc+unroll49", dict(pallas_encoder=True, unroll=49)),
    ]

rows = []
for name, kw in CONFIGS:
    r = bench.run_workload(**kw)
    row = {"name": name, **kw, "epoch_s": round(r["epoch_s"], 5),
           "rhs_evals_per_s": round(r["rhs_evals_per_s"]),
           "final_train_loss": r["final_train_loss"]}
    rows.append(row)
    print(json.dumps(row), flush=True)
out_name = ("bench_configs.json" if len(sys.argv) <= 1 else
            "bench_%s.json" % sys.argv[1])
with open(os.path.join(ROOT, "benchmarks", out_name), "w") as f:
    json.dump(rows, f, indent=2)
