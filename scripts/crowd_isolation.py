"""Root-cause the crowd-scene delta: forward precision vs decode.

Round 4's CROWD_CHECK ran our stack at the serving default
(TPU, bf16 activations, MXU-default multiplies) against the reference's
torch-CPU-f32 forward and measured AP +0.0078 / matched coordinates up
to 2.64 px on 8-12-person scenes — while the CPU-f32 TRAINED_PARITY
crowded regime shows 0.0 px. This driver isolates the cause by running
the SAME scenes + checkpoint through scripts/crowd_check.py under a
precision matrix:

- ``tpu_bf16_fast``    — the round-4 configuration, reproduced;
- ``tpu_f32_fast``     — f32 operands, MXU default (bf16 multiplies);
- ``tpu_f32_highest``  — the --precision highest serving knob
  (true-f32 multiplies, runtime/estimator.py::matmul_precision);
- ``cpu_f32``          — XLA CPU f32 (the platform of every ΔAP=0 gate).

The executed-reference pass (torch CPU f32 + SWIG decode,
reference eval.py:129-170 + lib/pafprocess/pafprocess.cpp:127-191) runs
once and is reused — it has no TPU in it. If the delta collapses to ~0
px on cpu_f32 AND tpu_f32_highest but persists under the bf16/fast
rows, the cause is attributed to forward multiply precision, not a
decode divergence; if any f32-true config still diverges, there IS a
decode difference at density and the artifact says so.

Writes the merged CROWD_CHECK.json (isolation block + attribution).
Usage:  python scripts/crowd_isolation.py [--ckpt ...] [--skip ...]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    # (name, extra argv)
    ("tpu_bf16_fast", ["--dtype", "bfloat16", "--precision", "fast"]),
    ("tpu_f32_fast", ["--dtype", "float32", "--precision", "fast"]),
    ("tpu_f32_highest", ["--dtype", "float32", "--precision", "highest"]),
    ("cpu_f32", ["--cpu", "--dtype", "float32", "--precision", "fast"]),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/tmp/synparity/trained_ref.pth")
    ap.add_argument("--workdir", default="/tmp/crowdval")
    ap.add_argument("--images", type=int, default=12)
    ap.add_argument("--out", default="CROWD_CHECK.json")
    ap.add_argument("--skip", default="",
                    help="comma-separated config names to skip (reuse "
                    "their existing per-config json)")
    args = ap.parse_args()

    skip = set(filter(None, args.skip.split(",")))
    runs = {}
    for i, (name, extra) in enumerate(CONFIGS):
        cfg_out = os.path.join(args.workdir, f"crowd_{name}.json")
        if name in skip and os.path.isfile(cfg_out):
            print(f">> {name}: reusing {cfg_out}")
        else:
            cmd = [
                sys.executable, os.path.join(REPO, "scripts/crowd_check.py"),
                "--ckpt", args.ckpt, "--workdir", args.workdir,
                "--images", str(args.images), "--out", cfg_out,
            ] + extra
            if i > 0 or os.path.isfile(
                    os.path.join(args.workdir, "results_reference.json")):
                cmd.append("--skip-reference")
            print(">>", " ".join(cmd), flush=True)
            subprocess.run(cmd, check=True)
        with open(cfg_out) as f:
            runs[name] = json.load(f)

    # ---- merge + attribute ---------------------------------------------
    iso = {}
    for name, run in runs.items():
        ref = run["results"]["reference"]
        iso[name] = {
            "backend": run["backend"],
            "dtype": run["dtype"],
            "precision": run["precision"],
            "ap_ours_oracle": run["results"]["numpy"]["ap"],
            "ap_ours_device": run["results"]["jax"]["ap"],
            "ap_reference": ref["ap"],
            "ap_delta_ours_vs_reference":
                run["ap_delta_ours_vs_reference"],
            "matched_max_px_oracle_vs_reference":
                ref["agreement_vs_oracle"]["matched_max_px"],
            "matched_mean_px_oracle_vs_reference":
                ref["agreement_vs_oracle"]["matched_mean_px"],
            "count_agreement":
                ref["agreement_vs_oracle"]["count_agreement"],
        }

    def collapsed(name):
        r = iso[name]
        return (
            abs(r["ap_delta_ours_vs_reference"]) <= 0.004
            and (r["matched_max_px_oracle_vs_reference"] or 0.0) <= 0.5
        )

    f32_true = [n for n in ("cpu_f32", "tpu_f32_highest") if n in iso]
    bf16ish = [n for n in ("tpu_bf16_fast", "tpu_f32_fast") if n in iso]
    if f32_true and all(collapsed(n) for n in f32_true):
        attribution = (
            "forward multiply precision: with true-f32 multiplies "
            "(cpu_f32 and tpu_f32_highest) the coordinate/AP delta vs "
            "the executed reference collapses to ~0, while the MXU "
            "bf16-multiply configs reproduce the round-4 gap — the "
            "decoder itself does NOT diverge at 8-12-person density. "
            "TPU serving at parity-grade numerics = --precision highest."
        )
        attributed = True
    else:
        bad = [n for n in f32_true if not collapsed(n)]
        attribution = (
            f"NOT fully attributed to precision: {bad} still diverge "
            "with true-f32 multiplies — a real decode difference at "
            "density; see the per-config rows"
        )
        attributed = False

    # the round-4-shape base, from the serving-default config
    base = dict(runs.get("tpu_bf16_fast") or next(iter(runs.values())))
    base["isolation"] = {
        "question": "is the round-4 crowd delta (AP +0.0078, 2.64 px "
                    "max matched coords) forward precision or a decode "
                    "divergence?",
        "configs": iso,
        "bf16_multiply_configs": bf16ish,
        "true_f32_configs": f32_true,
        "attributed": attributed,
        "attribution": attribution,
    }
    with open(args.out, "w") as f:
        json.dump(base, f, indent=2)
        f.write("\n")
    print(json.dumps(base["isolation"], indent=2))
    sys.exit(0 if attributed else 1)


if __name__ == "__main__":
    main()
