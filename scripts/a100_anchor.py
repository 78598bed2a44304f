"""Derive the A100-class throughput anchor for the north-star claim.

The reference publishes NO throughput numbers (SURVEY.md §6), so
"≥3× A100-class audio-seconds/s/chip" needs a quantified basis.  This
script derives it two ways and prints both, clearly labeled:

1. **Measured-CPU extrapolation (the recorded anchor).**  Run the
   reference topology's full eager-torch fp32 train step (fwd + SI-SNR-
   style time-domain loss surrogate + bwd + Adam) on THIS host's CPU,
   compute the fraction of the CPU's dense-fp32 peak that eager torch
   sustains, and assume torch sustains the same fraction of an A100's
   TF32 peak (generous to the A100: eager per-op dispatch hides less
   latency on an accelerator).  CPU peak = cores × nominal GHz × 32
   fp32 FLOP/cycle (AVX2 2×FMA×8 lanes; ×2 for AVX-512 if detected).

2. **Equal-MFU bound (the skeptical ceiling).**  Assume an XLA-quality
   stack on the A100 hits the same MFU we measure on v5e, at bf16 peak.
   This answers "our code on their chip", not "the reference on their
   chip" — it is the number a skeptic should quote.

Writes the derived utilization + anchors to docs/a100_anchor.json.
`voicesplit_tpu.utils.profiling.A100_CLASS_UTILIZATION` records the
measured value for bench.py (update it if this host re-measures
differently).

Usage:  python scripts/a100_anchor.py [--batch 2] [--steps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def cpu_fp32_peak() -> tuple[float, str]:
    """Nominal dense fp32 peak of this host: cores × GHz × FLOP/cycle."""
    cores = os.cpu_count() or 1
    ghz = None
    model_name = ""
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            info = f.read()
        m = re.search(r"model name\s*:\s*(.+)", info)
        if m:
            model_name = m.group(1).strip()
            freq = re.search(r"(\d+(?:\.\d+)?)\s*GHz", model_name)
            if freq:
                ghz = float(freq.group(1))
        fm = re.search(r"flags\s*:\s*(.+)", info)
        if fm:
            flags = fm.group(1)
        if ghz is None:
            mhz = re.search(r"cpu MHz\s*:\s*(\d+(?:\.\d+)?)", info)
            if mhz:
                ghz = float(mhz.group(1)) / 1000.0
    except OSError:
        pass
    ghz = ghz or 2.0
    flop_per_cycle = 64 if "avx512f" in flags else 32  # 2 FMA ports × width × 2
    peak = cores * ghz * 1e9 * flop_per_cycle
    basis = f"{cores} cores × {ghz:.2f} GHz × {flop_per_cycle} fp32 FLOP/cycle ({model_name})"
    return peak, basis


def measure_torch_cpu_step(batch: int, steps: int, frames: int = 301) -> float:
    """Median wall seconds of one eager fp32 torch train step on CPU."""
    import torch

    from voicesplit_tpu.models.torch_ref import build_reference_torch_model

    torch.manual_seed(0)
    model = build_reference_torch_model("mish")
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    spec = torch.rand(batch, frames, 601)
    emb = torch.randn(batch, 256)
    times = []
    for i in range(steps + 1):
        t0 = time.perf_counter()
        opt.zero_grad()
        mask = model(spec, emb)
        # loss surrogate with the same tensor shapes as the trainer's
        # masked-spec objective (the reference's iSTFT+SI-SNR adds ~5%
        # more work, so this slightly FLATTERS the torch step)
        loss = ((mask * spec - 0.5 * spec) ** 2).mean()
        loss.backward()
        opt.step()
        if i > 0:  # discard the first (allocator warmup)
            times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    parser = argparse.ArgumentParser()
    # B=16 by default: batch=2 underfills even a CPU (round-2 VERDICT
    # weak #4) and understates eager-torch utilization
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--steps", type=int, default=3)
    args = parser.parse_args()

    from voicesplit_tpu.utils.profiling import (
        A100_BF16_FLOPS,
        A100_TF32_FLOPS,
        masknet_train_step_cost,
    )

    frames = 301
    audio_len = 3.0
    cost = masknet_train_step_cost(args.batch, frames)
    step_s = measure_torch_cpu_step(args.batch, args.steps, frames)
    peak, peak_basis = cpu_fp32_peak()
    achieved = cost.flops / step_s
    util = achieved / peak
    cpu_tput = args.batch * audio_len / step_s

    a100_anchor = args.batch * audio_len / (cost.flops / (A100_TF32_FLOPS * util))

    # Skeptical ceiling: our measured v5e MFU applied to A100 bf16 peak.
    # Read the newest recorded bench mfu (BENCH_r*.json carry it both at
    # top level of "parsed" and in the "# detail" line; bench_baseline's
    # round-1 detail predates the field).
    from glob import glob

    v5e_mfu, mfu_src = 0.43, "fallback (no recorded bench mfu found)"
    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    for p in sorted(glob(os.path.join(repo, "BENCH_r*.json")), reverse=True):
        try:
            with open(p) as f:
                rec = json.load(f)
            mfu = rec.get("parsed", {}).get("mfu") or rec.get("mfu")
        except (OSError, ValueError):
            continue
        if mfu:
            v5e_mfu, mfu_src = float(mfu), os.path.basename(p)
            break
    print(f"v5e MFU for equal-MFU bound: {v5e_mfu} (from {mfu_src})")
    equal_mfu_bound = args.batch * audio_len / (cost.flops / (A100_BF16_FLOPS * v5e_mfu))

    out = {
        "torch_cpu_step_s": step_s,
        "torch_cpu_audio_sec_per_s": cpu_tput,
        "cpu_fp32_peak_flops": peak,
        "cpu_peak_basis": peak_basis,
        "eager_torch_utilization": util,
        "a100_class_audio_sec_per_s (measured-CPU extrapolation, TF32 peak)": a100_anchor,
        "a100_equal_mfu_audio_sec_per_s (skeptical: our MFU at A100 bf16 peak)": equal_mfu_bound,
        "model_tflops_per_step": cost.flops / 1e12,
        "batch": args.batch,
        "v5e_mfu_used": v5e_mfu,
        "v5e_mfu_source": mfu_src,
    }
    path = os.path.join(os.path.dirname(__file__), "..", "docs", "a100_anchor.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    print(f"\nwrote {os.path.normpath(path)}")


if __name__ == "__main__":
    main()
