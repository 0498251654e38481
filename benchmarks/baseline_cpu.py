"""Measured CPU baseline for bench.py's vs_baseline denominator.

The reference (TF 1.14 Estimator, single-process CPU — SURVEY.md §6) publishes
no throughput numbers, so round 1 used an assumed 2,000 ex/s.  This script
replaces the assumption with a measurement: a faithful torch-CPU DIN —
same tables (userid 20k x 16, shared feedid 106k x 16, 4x small-dim fields,
mean-pooled tags), the reference's target-attention MLP (din_attention.py:
concat(q,k,q-k,q*k) -> 64 -> 32 -> 1, masked weighted sum), the
512-256-128 PReLU+BN+dropout tower (din.py:224-238), BCE loss, Adam — at the
reference's default batch_size=1024 (din.py flags), eager CPU execution
(the closest available stand-in for TF1 graph-mode CPU: both MKL-backed,
same op granularity; TF is not installed in this image).

Writes benchmarks/BASELINE_CPU.json: {"examples_per_s": N, ...}.
bench.py uses this measured number when present.

Run: python benchmarks/baseline_cpu.py [--batch_size 1024] [--steps 20]
"""

from __future__ import annotations

import argparse
import json
import os
import platform
import time

import numpy as np
import torch
import torch.nn as nn

VOCABS = {
    "userid": (20000, 16),
    "feedid": (106444, 16),
    "device": (2, 2),
    "authorid": (18789, 4),
    "bgm_song_id": (25160, 4),
    "bgm_singer_id": (17501, 4),
    "manual_tag_id": (353, 4),
}
T_SEQ, T_TAG, N_DENSE = 50, 24, 16


class TorchDIN(nn.Module):
    def __init__(self):
        super().__init__()
        self.emb = nn.ModuleDict(
            {k: nn.Embedding(v + 1, d, padding_idx=0) for k, (v, d) in VOCABS.items()}
        )
        h = VOCABS["feedid"][1]
        self.att = nn.Sequential(
            nn.Linear(4 * h, 64), nn.Sigmoid(), nn.Linear(64, 32), nn.Sigmoid(),
            nn.Linear(32, 1),
        )
        in_dim = N_DENSE + 16 + 2 + 4 + 4 + 4 + 4 + h + h
        units = [512, 256, 128]
        layers = []
        for u in units:
            layers += [nn.Linear(in_dim, u), nn.PReLU(u), nn.BatchNorm1d(u),
                       nn.Dropout(0.1)]
            in_dim = u
        layers.append(nn.Linear(in_dim, 1))
        self.fcn = nn.Sequential(*layers)

    def forward(self, batch):
        cats = [self.emb[k](batch[k]) for k in
                ("userid", "device", "authorid", "bgm_song_id", "bgm_singer_id")]
        tag = self.emb["manual_tag_id"](batch["manual_tag_list"])  # (B, Tt, 4)
        tag_mask = (batch["manual_tag_list"] > 0).float().unsqueeze(-1)
        tag = (tag * tag_mask).sum(1) / tag_mask.sum(1).clamp(min=1.0)
        target = self.emb["feedid"](batch["feedid"])               # (B, H)
        seq = self.emb["feedid"](batch["his_seq"])                 # (B, T, H)
        q = target.unsqueeze(1).expand_as(seq)
        w = self.att(torch.cat([q, seq, q - seq, q * seq], -1)).squeeze(-1)
        mask = (torch.arange(T_SEQ).unsqueeze(0) < batch["his_seq_len"].unsqueeze(1))
        w = w * mask.float()
        att = torch.bmm(w.unsqueeze(1), seq).squeeze(1)            # (B, H)
        x = torch.cat([batch["dense"]] + cats + [tag, target, att], -1)
        return self.fcn(x).squeeze(-1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=1024)  # reference default
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    args = p.parse_args()
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    B = args.batch_size

    def make_batch():
        return {
            "dense": torch.from_numpy(
                rng.normal(size=(B, N_DENSE)).astype(np.float32)),
            "labels": torch.from_numpy(
                (rng.random(B) < 0.1).astype(np.float32)),
            "his_seq": torch.from_numpy(
                rng.integers(0, VOCABS["feedid"][0], (B, T_SEQ)).astype(np.int64)),
            "his_seq_len": torch.from_numpy(
                rng.integers(1, T_SEQ + 1, B).astype(np.int64)),
            "manual_tag_list": torch.from_numpy(
                rng.integers(0, VOCABS["manual_tag_id"][0], (B, T_TAG)).astype(np.int64)),
            **{k: torch.from_numpy(rng.integers(0, VOCABS[k][0], B).astype(np.int64))
               for k in ("userid", "feedid", "device", "authorid",
                          "bgm_song_id", "bgm_singer_id")},
        }

    model = TorchDIN().train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    bce = nn.BCEWithLogitsLoss()
    batches = [make_batch() for _ in range(4)]

    def step(b):
        opt.zero_grad()
        loss = bce(model(b), b["labels"])
        loss.backward()
        opt.step()
        return float(loss)

    for i in range(args.warmup):
        step(batches[i % 4])
    t0 = time.perf_counter()
    for i in range(args.steps):
        step(batches[i % 4])
    dt = time.perf_counter() - t0
    ex_s = args.steps * B / dt
    out = {
        "examples_per_s": round(ex_s, 1),
        "step_ms": round(dt / args.steps * 1e3, 2),
        "batch_size": B,
        "model": "DIN (torch eager, CPU)",
        "torch": torch.__version__,
        "threads": torch.get_num_threads(),
        "cpu_count": os.cpu_count(),
        "platform": platform.platform(),
        "note": "stand-in for the reference's TF1-CPU stack (TF unavailable); "
                "same tables/attention/tower at reference batch 1024",
    }
    path = os.path.join(os.path.dirname(__file__), "BASELINE_CPU.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
