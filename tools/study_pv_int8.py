"""Accuracy study: int8 p@v with per-(row, kv-block) scales.

Round-3 rejected quantizing the softmax probability matrix at a single
global 1/127 step (up to 16% relative output error on flat rows — see
`kernels/flash_attention.py:_kernel_single_int8` docstring); the round-4
ledger asked for per-BLOCK p-scales to be re-tested before closing the
lever (INT8.md).  This study answers the accuracy half: quantize the
unnormalized max-free p matrix to int8 with (a) one scale per row and
(b) one scale per (row, kv-block of 512), run the p@v contraction in
int8, and compare the normalized attention output against the exact f32
path across temperature regimes (flat -> peaked softmax).

Pure math — platform-independent, runs on CPU.  If the error verdict
fails here, no kernel engineering is warranted; if it passes, a Pallas
prototype decides the speed half (the quantize itself costs VPU absmax +
round/clip passes over [bq, N] — the same class of pass the max-free and
sum-on-MXU work just removed).

Usage: python tools/study_pv_int8.py   (prints one JSON line)
"""

from __future__ import annotations

import json

import numpy as np


def attention_exact(s, v):
    p = np.exp2(s - s.max(axis=-1, keepdims=True))
    return (p @ v) / p.sum(axis=-1, keepdims=True)


def attention_p_int8(s, v, block=None):
    """Max-free unnormalized p, quantized per row (block=None) or per
    (row, kv-block); int8 p @ f32 v with per-block dequant, then the
    exact row-sum normalizer (the sum rides the same quantized dot in a
    real kernel — include it in the quantized path for honesty)."""
    p = np.exp2(s - s.max(axis=-1, keepdims=True))  # numerics-stable stand-in
    n = p.shape[-1]
    block = block or n
    out = np.zeros(p.shape[:-1] + (v.shape[-1],), np.float64)
    den = np.zeros(p.shape[:-1] + (1,), np.float64)
    for j0 in range(0, n, block):
        pb = p[..., j0:j0 + block]
        scale = np.maximum(pb.max(axis=-1, keepdims=True), 1e-30) / 127.0
        pq = np.clip(np.round(pb / scale), -127, 127).astype(np.int8)
        pd = pq.astype(np.float64) * scale
        out += pd @ v[j0:j0 + block]
        den += pd.sum(axis=-1, keepdims=True)
    return out / np.maximum(den, 1e-30)


def main():
    rng = np.random.default_rng(0)
    n, d = 4096, 64
    q = rng.normal(0, 1, (n, d))
    k = rng.normal(0, 1, (n, d))
    v = rng.normal(0, 1, (n, d))
    base = (q @ k.T) / np.sqrt(d) * np.log2(np.e)

    out = {"n": n, "d": d, "block": 512, "regimes": {}}
    # temperature sweeps the softmax entropy: tau=1 is the flat unit-normal
    # regime; tau=8/16 emulate sharply peaked attention rows (the regime
    # that killed the global-scale variant is flat; the regime that kills
    # per-row scales is peaked)
    for tau in (0.5, 1.0, 2.0, 4.0, 8.0, 16.0):
        s = base * tau
        exact = attention_exact(s, v)
        mag = np.abs(exact).mean()
        row = attention_p_int8(s, v, block=None)
        blk = attention_p_int8(s, v, block=512)
        ent = None
        p = np.exp2(s - s.max(axis=-1, keepdims=True))
        p /= p.sum(axis=-1, keepdims=True)
        ent = float(np.mean(-(p * np.log(np.maximum(p, 1e-300))).sum(-1)))
        out["regimes"][f"tau{tau}"] = {
            "softmax_entropy_nats": round(ent, 2),
            "per_row_rel_mae": float(np.abs(row - exact).mean() / mag),
            "per_block_rel_mae": float(np.abs(blk - exact).mean() / mag),
            "per_row_rel_max": float(np.abs(row - exact).max() / mag),
            "per_block_rel_max": float(np.abs(blk - exact).max() / mag),
        }
    worst_blk = max(r["per_block_rel_max"] for r in out["regimes"].values())
    out["verdict"] = (
        f"worst per-block rel max err {worst_blk:.3f}; compare: the kept "
        "int8-score (q/k) path is <1% — p@v int8 would add the largest "
        "single quantization error in the pipeline AND a new [bq,N] VPU "
        "absmax+round pass of the exact kind the max-free/sum-on-MXU work "
        "removed; see INT8.md for the closing rationale")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
