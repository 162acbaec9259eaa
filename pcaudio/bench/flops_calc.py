"""FLOPs accounting for the set-attention models and the DSP front-end.

The reference ships an EMPTY ``Code/flops_calc.py`` (0 bytes); its intended
role — the compute-vs-accuracy tradeoff behind the paper's subsampling curves
(BASELINE.json) — is implemented here for real: closed-form counts for
MAB/ISAB/PMA/ST (the O(N·m) ISAB terms), the DFT-matmul STFT, and the
baselines, plus XLA-measured FLOPs from compiled executables for
cross-checking.

Conventions: one multiply-add = 2 FLOPs; biases, softmax, and other
elementwise work are excluded (sub-1% for these shapes).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax


def dense_flops(n_rows: int, d_in: int, d_out: int) -> int:
    return 2 * n_rows * d_in * d_out


def mab_flops(n_q: int, n_kv: int, dim_q: int, dim_k: int, dim_v: int) -> int:
    """One MAB (``set_transformer-master/modules.py:19-33``): q/k/v
    projections, per-head QKᵀ and A·V (2·n_q·n_kv·dim_v each over all heads),
    and the output projection."""
    proj = (dense_flops(n_q, dim_q, dim_v)
            + 2 * dense_flops(n_kv, dim_k, dim_v))
    attn = 2 * (2 * n_q * n_kv * dim_v)
    ff = dense_flops(n_q, dim_v, dim_v)
    return proj + attn + ff


def isab_flops(n: int, dim_in: int, dim_out: int, num_inds: int) -> int:
    """ISAB = MAB(I[m], X[n]) + MAB(X[n], H[m]) — O(n·m), the reference's
    entire answer to set-size scaling (SURVEY.md §5)."""
    return (mab_flops(num_inds, n, dim_out, dim_in, dim_out)
            + mab_flops(n, num_inds, dim_in, dim_out, dim_out))


def pma_flops(n: int, dim: int, num_seeds: int) -> int:
    return mab_flops(num_seeds, n, dim, dim, dim)


def st_flops(n_points: int, dim_input: int, dim_hidden: int, num_inds: int,
             dim_output: int, num_outputs: int = 1) -> int:
    """The paper's ST model (``Code/models.py:13-44``): ISAB×2 + PMA + Dense."""
    return (isab_flops(n_points, dim_input, dim_hidden, num_inds)
            + isab_flops(n_points, dim_hidden, dim_hidden, num_inds)
            + pma_flops(n_points, dim_hidden, num_outputs)
            + dense_flops(num_outputs, dim_hidden, dim_output))


def baseline_ff_flops(layer_dims: Sequence[int], nclasses: int) -> int:
    total = 0
    for a, b in zip(layer_dims[:-1], layer_dims[1:]):
        total += dense_flops(1, a, b)
    return total + dense_flops(1, layer_dims[-1], nclasses)


def cnn_classifier_flops(Nt: int, Nf: int, layer_dims: Sequence[int],
                         nclass: int) -> int:
    kw = Nf + 1 - layer_dims[0]
    conv = 2 * layer_dims[0] * Nt * kw  # [1,1,Nt,kw] kernel over [Nt,Nf]
    return conv + baseline_ff_flops(layer_dims, nclass)


def stft_flops(n_fft: int, num_frames: int, method: str = "dft_matmul") -> int:
    f = n_fft // 2 + 1
    if method == "dft_matmul":
        return 2 * num_frames * n_fft * 2 * f
    # rfft: ~5 n log2 n per frame
    import math
    return int(5 * n_fft * math.log2(n_fft)) * num_frames


def pipeline_flops_per_clip(
    *, clip_seconds: float = 5.0, fs: int = 44100, n_fft: int = 1024,
    num_frames: int = 10, top_k: Optional[int] = 256,
    dim_hidden: int = 64, num_inds: int = 64, classes: int = 10,
) -> Dict[str, int]:
    """Analytic cost of the fused wave→points→class serving pipeline
    (bench.py headline)."""
    hop = n_fft // 2
    frames = 1 + int(clip_seconds * fs) // hop
    chunks = frames // num_frames
    k = top_k if top_k is not None else num_frames * (n_fft // 2)
    d = {
        "stft": stft_flops(n_fft, frames),
        "model": chunks * st_flops(k, 3, dim_hidden, num_inds, classes),
    }
    d["total"] = sum(d.values())
    return d


def measured_flops(fn, *args) -> Optional[float]:
    """XLA's own FLOP estimate for the compiled function (None if the backend
    doesn't report cost analysis)."""
    compiled = jax.jit(fn).lower(*args).compile()
    try:
        analyses = compiled.cost_analysis()
    except Exception:
        return None
    if not analyses:
        return None
    ca = analyses[0] if isinstance(analyses, (list, tuple)) else analyses
    return ca.get("flops")
