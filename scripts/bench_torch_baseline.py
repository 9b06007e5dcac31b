"""Measured torch baseline for the flagship benchmark (same machine).

The reference's training throughput is not published anywhere
(BASELINE.md: no numeric tables in-repo), so round 1's "A100 ≈ 10k
samples/s" was an unverifiable estimate. This script MEASURES the
reference-equivalent workload in torch on this machine's CPU — same model
shapes (ATM-S: channel-token embedding, one post-norm 4-head attention
layer with head-dim 62 and conv-FFN, TSConv, 1024-d projector), same batch
1024, same loss (0.99·img-InfoNCE + 0.01·text-InfoNCE) and the reference
loop's per-batch ``.item()`` syncs (``Retrieval/ATMS_retrieval.py:199-254``).

This is a torch reimplementation of the same architecture for benchmarking,
not a copy of the reference code. Run:

    python scripts/bench_torch_baseline.py [n_steps]

bench.py cites the resulting samples/s as ``baseline`` with provenance
"torch-cpu, this machine" — an honest measured denominator instead of a
guessed A100 figure.
"""

from __future__ import annotations

import json
import math
import sys
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

C, T, D_MODEL, HEADS, D_FF = 63, 250, 250, 4, 256
CONV_F, TK, POOL, STRIDE, EMB = 40, 25, 51, 5, 40
PROJ = 1024
BATCH = 1024


class TorchATMS(nn.Module):
    def __init__(self):
        super().__init__()
        self.token = nn.Linear(T, D_MODEL)
        self.subject = nn.Parameter(torch.randn(1, 1, D_MODEL) * 0.02)
        hd = D_MODEL // HEADS  # 62 — the reference's quirky head dim
        self.q = nn.Linear(D_MODEL, HEADS * hd)
        self.k = nn.Linear(D_MODEL, HEADS * hd)
        self.v = nn.Linear(D_MODEL, HEADS * hd)
        self.o = nn.Linear(HEADS * hd, D_MODEL)
        self.ln1 = nn.LayerNorm(D_MODEL)
        self.ff1 = nn.Conv1d(D_MODEL, D_FF, 1)
        self.ff2 = nn.Conv1d(D_FF, D_MODEL, 1)
        self.ln2 = nn.LayerNorm(D_MODEL)
        self.ln_f = nn.LayerNorm(D_MODEL)
        self.tconv = nn.Conv2d(1, CONV_F, (1, TK), padding=(0, TK // 2))
        self.pool = nn.AvgPool2d((1, POOL), (1, STRIDE))
        self.bn1 = nn.BatchNorm2d(CONV_F)
        self.sconv = nn.Conv2d(CONV_F, CONV_F, (C, 1))
        self.bn2 = nn.BatchNorm2d(CONV_F)
        self.head = nn.Conv2d(CONV_F, EMB, (1, 1))
        flat = EMB * ((T - POOL) // STRIDE + 1)
        self.proj1 = nn.Linear(flat, PROJ)
        self.proj2 = nn.Linear(PROJ, PROJ)
        self.logit_scale = nn.Parameter(
            torch.tensor(math.log(1 / 0.07), dtype=torch.float32))

    def forward(self, x):  # (B, C, T)
        B = x.shape[0]
        h = self.token(x)
        h = torch.cat([self.subject.expand(B, 1, D_MODEL), h], dim=1)
        hd = D_MODEL // HEADS
        q = self.q(h).view(B, -1, HEADS, hd).transpose(1, 2)
        k = self.k(h).view(B, -1, HEADS, hd).transpose(1, 2)
        v = self.v(h).view(B, -1, HEADS, hd).transpose(1, 2)
        a = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(hd), dim=-1)
        a = (a @ v).transpose(1, 2).reshape(B, -1, HEADS * hd)
        h = self.ln1(h + self.o(a))
        f = self.ff2(F.gelu(self.ff1(h.transpose(1, 2)))).transpose(1, 2)
        h = self.ln_f(self.ln2(h + f))[:, :C]  # keep 63 tokens
        g = h.unsqueeze(1)  # (B, 1, C, T)
        g = self.bn1(self.pool(self.tconv(g)))
        g = F.elu(g)
        g = F.elu(self.bn2(self.sconv(g)))
        g = self.head(g).flatten(1)
        return F.gelu(self.proj1(g)) + self.proj2(F.gelu(self.proj1(g))), \
            self.logit_scale


def infonce(a, b, scale):
    logits = scale * a @ b.T
    labels = torch.arange(a.shape[0])
    return 0.5 * (F.cross_entropy(logits, labels)
                  + F.cross_entropy(logits.T, labels))


def main(n_steps: int = 8):
    torch.manual_seed(0)
    model = TorchATMS()
    opt = torch.optim.AdamW(model.parameters(), lr=3e-4)
    img = torch.randn(BATCH, PROJ)
    txt = torch.randn(BATCH, PROJ)
    cls_feat = torch.randn(1654, PROJ)
    x = torch.randn(BATCH, C, T)

    def step():
        opt.zero_grad()
        feats, scale = model(x)
        loss = 0.99 * infonce(feats, img, scale) \
            + 0.01 * infonce(feats, txt, scale)
        loss.backward()
        opt.step()
        # the reference syncs loss + probe accuracy every batch (:238,250)
        probe = (feats.detach() @ cls_feat.T).argmax(dim=1)
        return loss.item(), (probe == 0).float().mean().item()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(n_steps):
        step()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "atms_contrastive_train_throughput_torch_cpu",
        "value": round(n_steps * BATCH / dt, 1),
        "unit": "samples/s",
        "hardware": "cpu (this machine)",
        "threads": torch.get_num_threads(),
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
