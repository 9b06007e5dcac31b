"""A defensible A100 band for the flagship-benchmark denominator.

Round 1-4 used "A100 ≈ 10k samples/s ≈ 500× the measured same-host torch-CPU
anchor" — a folklore multiplier. This script replaces it with a measured,
auditable BOUND: the reference training step
(``Retrieval/ATMS_retrieval.py:199-254``, eager torch, bs 1024) is profiled
with ``torch.profiler`` on the same workload twin ``bench_torch_baseline``
uses, giving

1. **K** — dispatched aten ops per optimizer step (each is ≥1 CUDA kernel
   launch in eager mode; many launch several). Eager small-op training at
   these shapes is LAUNCH-BOUND on an A100, so ``t_step ≥ K × t_launch``
   with the published eager-mode launch+dispatch overhead band
   t_launch ∈ [3 µs, 8 µs] is a tight floor.
2. **F** — actual fwd+bwd FLOPs per step (profiler ``with_flops``, matmul +
   conv terms, which dominate): compute floor ``F / peak``, with peak ∈
   [19.5 TF/s fp32 CUDA cores, 156 TF/s TF32] (the reference never enables
   TF32 matmul — torch ≥1.12 defaults it OFF — so 19.5 is the realistic
   edge; 156 is the generous one).
3. **B** — bytes touched per step (parameters + gradients + Adam state
   read/write + activations both directions, computed analytically from the
   model): memory floor ``B / bw`` with bw ∈ [1.55, 2.0] TB/s.

The A100 step time is bounded below by max(launch, compute, memory) floors;
the samples/s band is [1024/t_slowedge, 1024/t_fastedge]. The real
reference loop is STRICTLY slower than this bound (per-batch ``.item()``
syncs ×2, host dataloader, optimizer.zero_grad) — so dividing our measured
TPU throughput by the band's FAST edge is a conservative ``vs_baseline``.

Output: one JSON line with K, F, B, the step-time band, the samples/s band,
and the implied single number bench.py cites. Run on any host (CPU-only
profiling).
"""

from __future__ import annotations

import json
import sys

import numpy as np
import torch

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from bench_torch_baseline import BATCH, TorchATMS, infonce  # noqa: E402

# launch/dispatch overhead per CUDA kernel in eager torch (µs): published
# microbenchmarks put bare launch at ~2.2-4 µs and eager op dispatch
# (python + ATen + launch) at ~5-10 µs; [3, 8] brackets the realistic range
LAUNCH_US = (3.0, 8.0)
# A100 peak matmul FLOP/s: fp32 CUDA cores vs TF32 tensor cores
PEAK_FLOPS = (19.5e12, 156e12)
# A100 HBM bandwidth: 40GB (1.55 TB/s) vs 80GB (2.0 TB/s)
HBM_BPS = (1.55e12, 2.0e12)

#: aten ops that are metadata-only on GPU (no kernel launch)
_NO_KERNEL = (
    "aten::view", "aten::reshape", "aten::t", "aten::transpose",
    "aten::permute", "aten::expand", "aten::unsqueeze", "aten::squeeze",
    "aten::as_strided", "aten::detach", "aten::empty", "aten::empty_like",
    "aten::empty_strided", "aten::resolve_conj", "aten::resolve_neg",
    "aten::result_type", "aten::broadcast_tensors", "aten::_unsafe_view",
    "aten::narrow", "aten::slice", "aten::select", "aten::alias",
    "aten::conj", "aten::lift_fresh", "aten::to", "aten::_to_copy",
)


def profile_step():
    torch.manual_seed(0)
    model = TorchATMS()
    opt = torch.optim.AdamW(model.parameters(), lr=3e-4)
    img = torch.randn(BATCH, 1024)
    txt = torch.randn(BATCH, 1024)
    cls_feat = torch.randn(1654, 1024)
    x = torch.randn(BATCH, 63, 250)

    def step():
        opt.zero_grad()
        feats, scale = model(x)
        loss = 0.99 * infonce(feats, img, scale) \
            + 0.01 * infonce(feats, txt, scale)
        loss.backward()
        opt.step()
        probe = (feats.detach() @ cls_feat.T).argmax(dim=1)
        return loss.item(), (probe == 0).float().mean().item()

    step()  # warmup (autograd graph caches, cudnn-equivalent plan caches)
    from torch.profiler import ProfilerActivity, profile

    with profile(activities=[ProfilerActivity.CPU], with_flops=True) as prof:
        step()
    events = prof.key_averages()
    kernels = 0
    flops = 0
    for ev in events:
        name = ev.key
        if not name.startswith("aten::"):
            continue
        if name in _NO_KERNEL:
            continue
        kernels += ev.count
        flops += getattr(ev, "flops", 0) or 0
    return kernels, float(flops), model


def bytes_per_step(model) -> float:
    """HBM traffic floor per optimizer step (fp32): params are read for
    fwd + bwd and read+written by AdamW along with two moment buffers and
    gradients (≈ 4 reads + 3 writes of P); activations are written once
    forward and read once backward (≈ 2×A)."""
    P = sum(p.numel() for p in model.parameters())
    # forward activation elements at bs 1024 (dominant tensors):
    B, C, T, D, FF, F_CH, PTOK = BATCH, 63, 250, 250, 256, 40, 36
    acts = B * (
        C * D  # token embedding
        + 3 * 64 * D  # qkv (64 tokens)
        + 4 * 64 * 64  # attention probs (4 heads)
        + 64 * D * 3  # attn out + ln + residuals
        + 64 * FF  # ffn hidden
        + 64 * D * 2  # ffn out + ln
        + F_CH * C * T  # temporal conv map (pre-pool)
        + F_CH * C * PTOK  # pooled
        + F_CH * PTOK * 2  # spatial conv + head
        + 1024 * 3  # projector
        + 1024 * 2 // 1024 * 1654  # logits (1654-way probe + InfoNCE)
    )
    return 4.0 * (7 * P + 2 * acts)


def main():
    kernels, flops, model = profile_step()
    traffic = bytes_per_step(model)

    floors_fast = {
        "launch_s": kernels * LAUNCH_US[0] * 1e-6,
        "compute_s": flops / PEAK_FLOPS[1],
        "memory_s": traffic / HBM_BPS[1],
    }
    floors_slow = {
        "launch_s": kernels * LAUNCH_US[1] * 1e-6,
        "compute_s": flops / PEAK_FLOPS[0],
        "memory_s": traffic / HBM_BPS[0],
    }
    t_fast = max(floors_fast.values())  # fastest plausible A100 step
    t_slow = max(floors_slow.values())
    band = (BATCH / t_slow, BATCH / t_fast)
    print(json.dumps({
        "kernels_per_step": kernels,
        "profiled_flops_per_step": flops,
        "est_bytes_per_step": traffic,
        "binding_floor_fast": max(floors_fast, key=floors_fast.get),
        "step_time_band_s": [round(t_fast, 6), round(t_slow, 6)],
        "a100_samples_per_s_band": [round(band[0]), round(band[1])],
        "conservative_denominator": round(band[1]),
        "note": (
            "upper bound on the reference's eager-torch A100 throughput "
            "(real loop adds .item() syncs + host dataloading); "
            "vs_baseline divides by the band's FAST edge"
        ),
    }))


if __name__ == "__main__":
    main()
