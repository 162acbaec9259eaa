"""Fused featurize Pallas kernel: waveform → temporal-chunk |STFT|² grids.

ONE kernel pass replaces the whole serving featurize chain (trim → reflect
pad → frame → window → DFT → chunk): each wave is read from HBM exactly once
and everything else happens in VMEM.  Measured on v5e at B=512×5 s clips:
the round-1 XLA chain cost 76.8 ms, the first fused kernel (XLA preamble for
trim + boundary-frame gathers) 47 ms — the gathers and the extra trim pass
over the 452 MB wave batch dominated.  This version moves both INTO the
kernel:

  * **trim** (librosa ``effects.trim(top_db=60)`` exact semantics,
    ``Code/settransformer.py:48``): block energies fall out of the wave rows
    already resident in VMEM; the centered-frame main term is a shift-add of
    4 block energies; the left/right reflect corrections are static-slice
    scalar fixes and 4 masked window sums.  No second pass over the wave.
  * **STFT**: the windowed-DFT basis is folded into two ``[hop, 2F]`` matmul
    operands (round-1 zero-materialization STFT, ``pcaudio/dsp/stft.py``);
    framing is the natural ``[R, hop]`` row view; the trim shift becomes a
    dynamic-start row write into a VMEM scratch + an 8-way static-slice
    switch for the sublane residual (Mosaic wants offsets ≡ 0 mod 8).
  * **boundary frames** (the two frames whose librosa reflect padding
    crosses the trim boundaries): built without any gather — a one-hot
    ``[4, R]`` row-selection matmul pulls the 4-row sample window, a
    ``[2048, 1024]`` iota-equality map matmul applies the (clip-dependent)
    reflect index map, and the shared DFT operands produce the spectrum.
    Gathering these 2×1024 samples per clip on the XLA side instead
    measured 32 ms at serving batch — generic gathers remain catastrophic.
  * output is squared magnitude (NOT log): selection downstream is monotonic
    in |·|², so ``log(1e-8 + sqrt(m²)/n_fft)`` is applied to the K winners
    only — 40x less transcendental work than logging the whole spectrogram.

Reference semantics reproduced: ``librosa.effects.trim(x, top_db=60)`` then
``librosa.stft(y, n_fft, hop=n_fft//2, center=True)``, Nyquist row dropped,
``Ntemp``-frame chunks with remainder discarded
(``Code/settransformertemp.py:50-59``).
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pcaudio.dsp.stft import dft_matrix, stft_window

Array = jax.Array

_AMIN = 1.0e-10  # librosa power_to_db floor
_LOG10 = 2.302585092994046


def _kernel(len_ref, x_ref, w0_ref, w1_ref, p0a_ref, p0b_ref,
            out_ref, info_ref, scratch, *,
            L, R, F, C, Nt, T, hop, trim, top_db, out_dtype, compute_dtype,
            shift, profile):
    # kernel-engineering probe: `profile` strips one class of work (WRONG
    # results, timing only) to attribute kernel time: "notrim" (skip the
    # in-kernel trim detector), "noboundary" (skip the two reflect boundary
    # frames), "noswitch" (static scratch read instead of the aligned
    # dynamic window + 8-way switch), "dftonly" (all three skipped:
    # interior DFT matmuls + scratch + output write floor).  Threaded as an
    # explicit argument (not an env var) so it participates in the jit
    # trace cache and cannot leak into production runs.
    _profile = profile
    c = pl.program_id(0)
    length = len_ref[c]
    x = x_ref[0]                                           # [R, hop] f32
    sidx = (jax.lax.broadcasted_iota(jnp.int32, (R, hop), 0) * hop
            + jax.lax.broadcasted_iota(jnp.int32, (R, hop), 1))

    # ---- trim (librosa effects.trim), all from the resident rows -------
    if trim and _profile not in ("dftonly", "notrim"):
        xsq = jnp.where(sidx < length, x * x, 0.0)         # [R, hop] f32
        eb = jnp.sum(xsq, axis=1, keepdims=True)           # [R, 1]

        # main term: frame t (2048-window, 512-hop, centered) spans blocks
        # t-2 .. t+1 (pcaudio/dsp/trim.py frame_power)
        zpad2 = jnp.zeros((2, 1), jnp.float32)
        ztail = jnp.zeros((max(T + 2 - R, 0), 1), jnp.float32)
        ebp = jnp.concatenate([zpad2, eb, ztail], axis=0)[: T + 3]
        main = ebp[0:T] + ebp[1:T + 1] + ebp[2:T + 2] + ebp[3:T + 3]

        # left reflect corrections (frames 0 and 1 only)
        x0sq = xsq[0:1, 0:1]
        l1 = (eb[0:1] - x0sq
              + xsq[1:2, 0:1] * (hop < length).astype(jnp.float32))
        l0 = (eb[0:1] + eb[1:2] - x0sq
              + xsq[2:3, 0:1] * (2 * hop < length).astype(jnp.float32))
        l0 = jnp.where(length > 0, l0, 0.0)
        l1 = jnp.where(length > 0, l1, 0.0)
        tio = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
        main = main + jnp.where(tio == 0, l0[0, 0], 0.0)
        main = main + jnp.where(tio == 1, l1[0, 0], 0.0)

        # right reflect corrections: frames whose 2048-window crosses
        # `length` mirror a tail window ending at length-2 (trim.py).  They
        # are ≤4 frames; each needs Σ xsq over [length-1-w, length-1).
        # Computed as prefix-sum differences S(hi) − S(lo): the block-level
        # prefix at each query row comes DIRECTLY from a masked-sum matmul
        # over eb ((rio5 < r5)·eb — an [8,R]×[R,1] dot), the sample-level
        # residue from a one-hot row extraction + lane-masked sum — ~4 tiny
        # matmuls instead of 4 full passes over the clip (Mosaic has no
        # value dynamic_slice, and staging xsq through the scratch for a
        # windowed read crashes the remote compiler).  An earlier form
        # materialized the FULL prefix via a strict-lower [R,R]×[R,1] f32
        # matvec and row-selected it — the lane-1 RHS pads to 128 lanes,
        # ~24 GMAC of f32 per serving batch spent producing 8 scalars.

        # All 5 prefix queries (the tail-window hi + 4 per-frame los) are
        # STACKED into one [5, R] one-hot row-select matmul + vectorized
        # masked sums: the previous per-query form issued ~25 one-row
        # matmul/select dispatches per clip, and per-op dispatch overhead
        # dominates at these shapes.
        tail = 2048 + hop
        wstart = jnp.clip(length - tail, 0, L - tail)
        offl = length - wstart
        hi = wstart + jnp.clip(offl - 1, 0, tail)
        t_first = (length - 2048 + 1024) // hop + 1  # first t with b > length
        us, oks, tjs = [hi], [], []
        for j in range(4):
            t_j = t_first + j
            a_j = t_j * hop - 1024
            b_j = a_j + 2048
            w_j = jnp.clip(b_j - length, 0, 2048)
            us.append(wstart + jnp.clip(offl - 1 - w_j, 0, tail))
            oks.append((b_j > length) & (a_j < length) & (t_j >= 0)
                       & (t_j < T))
            tjs.append(t_j)

        us += [jnp.zeros((), jnp.int32)] * 3        # pad rows 5→8 (sublane
        u5 = jnp.clip(jnp.stack(us).reshape(8, 1), 0, R * hop)   # [8, 1]
        r5 = u5 // hop
        c5 = u5 - r5 * hop
        rio5 = jax.lax.broadcasted_iota(jnp.int32, (8, R), 1)
        row5 = jnp.dot((rio5 == r5).astype(jnp.float32), xsq,
                       preferred_element_type=jnp.float32)       # [8, hop]
        ex5 = jnp.dot((rio5 < r5).astype(jnp.float32), eb,
                      preferred_element_type=jnp.float32)        # [8, 1]
        lane5 = jax.lax.broadcasted_iota(jnp.int32, (8, hop), 1)
        part5 = jnp.sum(jnp.where(lane5 < c5, row5, 0.0), axis=1,
                        keepdims=True)                           # [8, 1]
        # u == R·hop has r5 == R: the mask covers every eb row and c5 == 0
        # zeroes the partial row — no special case needed
        pre5 = ex5[:, :1] + part5                                # [5, 1]
        s_hi = pre5[0, 0]
        for j in range(4):
            val = s_hi - pre5[1 + j, 0]
            main = main + jnp.where((tio == tjs[j]) & oks[j], val, 0.0)

        mse = main * (1.0 / 2048.0)
        fmask = tio < 1 + length // hop
        ref = jnp.maximum(jnp.max(jnp.where(fmask, mse, 0.0)), _AMIN)
        db = 10.0 / _LOG10 * (jnp.log(jnp.maximum(mse, _AMIN)) - jnp.log(ref))
        ns = (db > -top_db) & fmask
        first = jnp.min(jnp.where(ns, tio, T))
        last = jnp.max(jnp.where(ns, tio, -1))
        any_ns = last >= 0
        s0 = jnp.where(any_ns, first, 0)
        end = jnp.where(any_ns, jnp.minimum(length, (last + 1) * hop), 0)
        tlen = end - s0 * hop
    else:
        s0 = jnp.zeros((), jnp.int32)
        tlen = length

    info_ref[c, 0] = s0 * hop
    info_ref[c, 1] = tlen

    # ---- STFT: interior frames ----------------------------------------
    xc = x.astype(compute_dtype)
    reim = (
        jnp.dot(xc[: R - 1], w0_ref[...], preferred_element_type=jnp.float32)
        + jnp.dot(xc[1:], w1_ref[...], preferred_element_type=jnp.float32)
    )                                                      # [R-1, 2F]
    m2 = reim[:, :F] ** 2 + reim[:, F:] ** 2               # [R-1, F]

    # ---- boundary frames (reflect at trim start / end), gather-free ----
    # Single-bounce reflect only: exact whenever tlen ≥ n_fft, which holds
    # for every clip with at least one valid chunk (needs tlen ≥ (Nt−1)·hop);
    # shorter clips produce masked garbage.
    do_boundary = _profile not in ("dftonly", "noboundary")
    t_last = tlen // hop
    xs = jnp.where(sidx < length, x, 0.0).astype(compute_dtype)
    start_s = s0 * hop

    if do_boundary:
        def row_window(r0, nrows):
            oh = (jax.lax.broadcasted_iota(jnp.int32, (nrows, R), 1)
                  == jax.lax.broadcasted_iota(jnp.int32, (nrows, R), 0) + r0
                  ).astype(compute_dtype)
            return jnp.dot(oh, xs, preferred_element_type=jnp.float32
                           ).astype(compute_dtype)         # [nrows, hop]

        def frame_m2(frame):
            reim_b = (jnp.dot(frame[:, :hop], w0_ref[...],
                              preferred_element_type=jnp.float32)
                      + jnp.dot(frame[:, hop:], w1_ref[...],
                                preferred_element_type=jnp.float32))
            return reim_b[:, :F] ** 2 + reim_b[:, F:] ** 2  # [1, F]

        # left (frame 0): window = trimmed samples [0, 1024) = rows s0,
        # s0+1; frame0[j] = window[|j−512|] — a CONSTANT map, applied via
        # the precomputed reflect operands (p0a/p0b), zero comparisons.
        w01 = row_window(jnp.clip(s0, 0, max(R - 2, 0)), 2)
        frame0 = (jnp.dot(w01[0:1], p0a_ref[...],
                          preferred_element_type=jnp.float32)
                  + jnp.dot(w01[1:2], p0b_ref[...],
                            preferred_element_type=jnp.float32)
                  ).astype(compute_dtype)
        m2_left = frame_m2(frame0)

        # right (frame t_last): 3-row window rows s0+t_last−2 … s0+t_last,
        # assembled by target-index one-hot map matmuls.  A cyclic-roll
        # formulation (2 dynamic f32 pltpu.rolls of the flattened window +
        # a constant lane-flip matmul, ~500x fewer VPU compares) was built
        # and chip-measured at 13.58 vs 13.20 ms/batch — the iota-equality
        # builds are NOT on the kernel's critical path, so the simpler
        # form stays.
        r3 = jnp.clip(s0 + t_last - 2, 0, max(R - 3, 0))
        w3 = row_window(r3, 3)
        j = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * hop), 1)
        tj = t_last * hop + j - hop
        g_abs = start_s + jnp.where(tj < tlen, tj,
                                    2 * tlen - 2 - tj)  # single bounce
        target = jnp.clip(g_abs - r3 * hop, 0, 3 * hop - 1)
        frame_l = jnp.zeros((1, 2 * hop), jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (hop, 2 * hop), 0)
        for r in range(3):
            sel_r = (lane + r * hop == target).astype(compute_dtype)
            frame_l = frame_l + jnp.dot(w3[r: r + 1], sel_r,
                                        preferred_element_type=jnp.float32)
        m2_right = frame_m2(frame_l.astype(compute_dtype))
        m2b = [m2_left, m2_right]

    # ---- trim shift + chunking --------------------------------------
    # frame t = spectrum row (s0 + t − 1).  Two formulations:
    #   * "onehot": ONE [C·Nt, R−1] one-hot shift matmul (row t selects
    #     spectrum row s0−1+t; out-of-range rows match nothing → 0).  The
    #     MXU work is ~1 ms at serving batch vs the switch's measured
    #     3.9 ms (profile_featurize_stages.py) and no scratch is touched.
    #     Selection commutes with the bf16 rounding (one-hot bf16 matmuls
    #     with f32 accumulation are exact), so for bf16 compute the output
    #     is bit-identical to the switch path — the serving default.
    #   * "switch": stage m2 through a VMEM scratch; Mosaic requires
    #     dynamic sublane offsets ≡ 0 (mod 8), so the trim shift is an
    #     aligned dynamic window read + an 8-way static-slice switch for
    #     the residual.  Keeps full f32 row values end-to-end — the
    #     default whenever compute/out dtypes are f32 (highest precision).
    if shift == "onehot" and _profile not in ("dftonly", "noswitch"):
        rio = jax.lax.broadcasted_iota(jnp.int32, (C * Nt, R - 1), 0)
        cio = jax.lax.broadcasted_iota(jnp.int32, (C * Nt, R - 1), 1)
        oh = (cio == rio + (s0 - 1)).astype(compute_dtype)
        frames = jnp.dot(oh, m2.astype(compute_dtype),
                         preferred_element_type=jnp.float32)
    else:
        # zero only the rows the m2 write below does NOT cover (reads past
        # the valid region must stay finite; a prior program's garbage
        # there would poison masked chunks with NaN through the 0-weighted
        # pooling)
        BASE = 8
        scratch[0:BASE, :] = jnp.zeros((BASE, F), jnp.float32)
        scratch[BASE + R - 1:, :] = jnp.zeros(
            (scratch.shape[0] - (BASE + R - 1), F), jnp.float32)
        scratch[BASE: BASE + R - 1, :] = m2  # spectrum row r ↦ frame r+1
        if _profile in ("dftonly", "noswitch"):
            frames = scratch[BASE: BASE + C * Nt, :]
        else:
            u = BASE - 1 + s0
            u_c = pl.multiple_of((u // 8) * 8, 8)
            delta = u - u_c
            window = scratch[pl.ds(u_c, C * Nt + 8), :]
            frames = jax.lax.switch(
                delta,
                [lambda w=window, d=d: w[d: d + C * Nt] for d in range(8)])
    if do_boundary:
        row = jax.lax.broadcasted_iota(jnp.int32, (C * Nt, 1), 0)
        frames = jnp.where(row == 0, m2b[0], frames)
        frames = jnp.where(row == t_last, m2b[1], frames)
    out_ref[0] = frames.reshape(C, Nt, F).astype(out_dtype)


def fused_chunk_mag2(
    waves: Array,
    lengths: Array,
    *,
    n_fft: int = 1024,
    num_frames: int = 10,
    trim: bool = True,
    top_db: float = 60.0,
    out_dtype=jnp.bfloat16,
    compute_dtype=jnp.bfloat16,
    shift: str = None,
    interpret=None,
    profile: str = "",
) -> Tuple[Array, Array]:
    """Batched fused featurize: ``[B, L]`` waves → ``(chunk_mag2
    [B, C, Nt, F], chunk_mask [B, C])`` with ``F = n_fft//2`` (Nyquist
    dropped) and ``C = T_max // Nt``.

    ``chunk_mag2`` is the squared un-normalized |STFT|²; downstream point
    values are ``log(1e-8 + sqrt(m²)/n_fft)`` (see module docstring).
    """
    B, L = waves.shape
    hop = n_fft // 2
    assert n_fft % hop == 0 and n_fft // hop == 2
    F = n_fft // 2
    Nt = num_frames

    t_max = 1 + L // hop
    C = t_max // Nt
    T = t_max  # trim-detector frame budget (same hop as the STFT)

    pad = (-L) % hop
    waves_p = jnp.pad(waves, ((0, 0), (0, pad))) if pad else waves
    R = waves_p.shape[1] // hop
    x3 = waves_p.reshape(B, R, hop)

    # dft_matrix is [cos(F+1) | −sin(F+1)]; drop the Nyquist column of each
    # half so the kernel works on an aligned [.., 2F] basis
    wd_full = stft_window(n_fft)[:, None] * dft_matrix(n_fft)
    w_dft = jnp.concatenate([wd_full[:, :F], wd_full[:, F + 1: 2 * F + 1]],
                            axis=1)
    w0 = w_dft[:hop].astype(compute_dtype)
    w1 = w_dft[hop:].astype(compute_dtype)

    # constant left-boundary reflect map: frame0[j] = window[|j − hop|]
    # (window = first 2·hop trimmed samples); split by window row
    jj = jnp.abs(jnp.arange(2 * hop) - hop)
    ii = jnp.arange(hop)
    p0a = (ii[:, None] == jj[None, :]).astype(compute_dtype)
    p0b = ((hop + ii)[:, None] == jj[None, :]).astype(compute_dtype)

    # scratch rows: static write at [8, 8+R−1); aligned window reads reach
    # (8−1+s0)//8·8 + C·Nt + 8 ≤ R + C·Nt + 16
    Rs = R + C * Nt + 16
    Rs += (-Rs) % 8

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # trim-shift formulation (see _kernel): one-hot shift matmul whenever
    # the output is bf16 anyway (selection commutes with the rounding —
    # bit-identical, measured faster); scratch+switch keeps f32 exactness
    if shift is None:
        shift = os.environ.get("PCAUDIO_FEATURIZE_SHIFT", "auto")
    if shift == "auto":
        shift = ("onehot"
                 if jnp.dtype(out_dtype) == jnp.dtype(jnp.bfloat16)
                 else "switch")
    assert shift in ("onehot", "switch")

    kern = functools.partial(
        _kernel, L=L, R=R, F=F, C=C, Nt=Nt, T=T, hop=hop, trim=trim,
        top_db=top_db, out_dtype=out_dtype, compute_dtype=compute_dtype,
        shift=shift, profile=profile)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, R, hop), lambda c, s: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, C, Nt, F), lambda c, s: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[pltpu.VMEM((Rs, F), jnp.float32)],
    )
    chunk_m2, info = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, C, Nt, F), out_dtype),
            jax.ShapeDtypeStruct((B, 2), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            # "parallel": grid steps are independent (the scratch is fully
            # re-zeroed/rewritten every step — no cross-step state), so
            # megacore may split the clip grid across both v5e cores.
            dimension_semantics=(
                os.environ.get("PCAUDIO_FEATURIZE_SEMANTICS", "parallel"),),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(lengths.astype(jnp.int32), x3, w0, w1, p0a, p0b)

    n_valid = 1 + info[:, 1] // hop
    chunk_mask = (jnp.arange(C)[None, :] + 1) * Nt <= n_valid[:, None]
    return chunk_m2, chunk_mask
