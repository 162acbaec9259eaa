"""Exact top-K chunk selection Pallas kernel (sort-free).

XLA's ``top_k`` is sort-based and catastrophic at serving shapes (73 ms for
top-128-of-5120 over 22k chunks on v5e even with the two-stage per-frame
decomposition; a full ``jnp.sort`` is no better), which made exact
extraction 3.7x slower than the approx path.  This kernel selects the exact
top-K of each chunk with NO sort:

  1. **Binary K-th-value search in value space** — non-negative f32
     values order like their IEEE bit patterns, so an MSB→LSB bit search
     over the value code (8 exponent rounds + one per INPUT-dtype mantissa
     bit: 7 for the bf16 serving grid, 23 for f32 — one full-grid probe
     each; radix 2 minimizes probe compares, which dominate; radix 4/8
     variants measured slower) finds the exact K-th largest value per
     chunk.  Probe thresholds are built *incrementally as floats*
     (exponent bits multiply ``tau`` by constant powers of two; mantissa
     bits add ``scale`` with ``scale /= 2`` per round — every step an
     exact f32 operation mirroring code arithmetic), eliminating v1's
     ~34-op arithmetic IEEE decode per round.
  2. **Counting without redundancy** — each probe's ``count(x ≥ t)`` is a
     sublane-axis reduction plus one tiny ``[bc,128]×[128,128]`` ones
     matmul (replicated-lane totals).  v1 pushed the full grid through a
     ``[·,F]×[F,128]`` ones matmul per probe — 128x redundant MXU work.
  3. **Tie resolution in flat order** — ``count(x > τ)`` winners plus the
     first ``K − count`` elements equal to τ, matching ``lax.top_k``'s
     deterministic take-first-on-ties semantics in row-major order.
  4. **Ranks via prefix matmuls** — exclusive prefix sums within each
     128-lane block (strict-lower-triangular MXU operand) plus a sublane
     cumsum of replicated block totals for the carry.
  5. **Compaction via a FACTORED one-hot scatter** — rank = rhi·8 + rlo;
     the digit one-hots cost (K/8 + 8)·piece compares instead of K·piece
     (the kernel's former largest VPU term), values and flat indices ride
     bf16-exact channels (f32 split bf16x3, index split
     ``(idx//256, idx%256)``) multiplied into the rlo one-hot, contracted
     against the rhi one-hot on the MXU, and unpacked to ``[·, K]`` by a
     constant one-hot lane expand + constant-masked sublane reductions.

Every tensor in the kernel keeps 8-aligned sublane dims and full 128
lanes: the v1 kernel carried ``[bc, Nt=10, F]`` blocks whose 10-wide
sublane tiling Mosaic handles ~5x slower (measured; same class of silent
penalty as the documented ``(4, 20)`` out-block case).

Everything happens in VMEM on the resident chunk; HBM traffic is the m²
read + the [K] outputs.  The selected SET is exactly ``lax.top_k``'s
(including its take-first-on-ties behavior); the output ORDER is ascending
flat index rather than descending value — the consumers are permutation-
invariant set models, and the parity tests assert set equality.

Caveat (shared with v1): the threshold search resolves values down to
2^-126; if the true K-th value is subnormal (< 1e-38 — squared magnitudes
of numerically silent audio) the tie cut among those denormal magnitudes
can differ from ``lax.top_k``'s.  TPU VPUs flush subnormals to zero
anyway, and no finite audio content is affected.

Mosaic survival rules on this backend (all probed, v1 history): no
lane-dim-1 tensors (per-chunk scalars ride 128 replicated lanes), no
bitcast, bf16 matmuls with f32 accumulation are exact for 0/1 and
small-integer operands.

Reference semantics accelerated: per-chunk magnitude top-K subsampling
(``Code/dataset.py:169-202``, ``pc_maxK`` in ``Code/utils.py:25-54``).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _compact_gather(x3, w, rank, ov_ref, oi_ref, *, bc, L, K,
                    val_channels):
    """Gather-form compaction: for each output slot k, FIND its winner.

    The scatter form (below) builds one-hot rank matrices over the whole
    flat axis and compacts with per-chunk ``[nrow, L]×[L, K/8]`` dots —
    measured weight-load-bound (contraction 5120 for 16 output lanes).
    This form inverts the problem using the fact that ``rank`` is the
    exclusive winner-prefix at EVERY flat position (not just winners):

      1. block-level prefixes ``P_b = rank[b, 0]`` and block-end inclusive
         counts partition [0, K): slot k's owning 128-lane block is the
         unique b with ``P_b ≤ k < incl[b, 127]`` — a [nb, K] one-hot from
         two broadcast compares (no per-element work on the flat axis).
      2. ONE batched ``[nb, K]ᵀ·[nb, 128·nch]`` matmul gathers the owning
         block's payload rows: value channel(s), ``incl mod 256``, and a
         constant block-id channel — contraction nb (≈40) with full 128
         output lanes, streaming K rows: fully MXU-utilized, ~40x less
         contraction than the scatter dot.
      3. the winner's lane is ``Σ_m 1[incl[b_k, m] ≤ k]`` — and since
         ``|k − incl| ≤ 128`` within the owning block, the test rides the
         mod-256 channel exactly (sequence-number compare), so no
         wide-integer channel splits are needed.

    All payload channels are small integers or bf16-exact values; every
    matmul is 0/1-bf16 × bf16 with f32 accumulation — exact.  Outputs land
    k-on-sublanes; one tiny ``[K, nch]ᵀ·I_K`` dot per chunk transposes the
    stacked results to the k-on-lanes output refs.
    """
    nb = L // 128
    assert nb <= 256, "block-id channel needs nb ≤ 256 for bf16 exactness"
    wf = w.astype(jnp.float32)
    incl = rank + wf                                      # [bc, nb, 128]

    # owning-block one-hot [bc, nb, K]: P_b ≤ k < P_b + tot_b
    P = rank[:, :, 0:1]                                   # [bc, nb, 1]
    IL = incl[:, :, 127:128]                              # [bc, nb, 1]
    kio = jax.lax.broadcasted_iota(jnp.int32, (bc, nb, K), 2
                                   ).astype(jnp.float32)
    oht = ((P <= kio).astype(jnp.float32)
           - (IL <= kio).astype(jnp.float32)).astype(jnp.bfloat16)

    # payload channels, 128 lanes each (all bf16-exact)
    im = incl - 256.0 * jnp.floor(incl * (1.0 / 256.0))   # incl mod 256
    bid = jax.lax.broadcasted_iota(jnp.int32, (bc, nb, 128), 1
                                   ).astype(jnp.float32)
    if val_channels == 1:
        vchans = [x3]
    else:
        h1 = x3.astype(jnp.bfloat16).astype(jnp.float32)
        r1 = x3 - h1
        h2 = r1.astype(jnp.bfloat16).astype(jnp.float32)
        vchans = [h1, h2, r1 - h2]
    nv = len(vchans)
    G = jnp.concatenate([c.astype(jnp.bfloat16) for c in vchans]
                        + [im.astype(jnp.bfloat16), bid.astype(jnp.bfloat16)],
                        axis=2)                           # [bc, nb, 128·nch]

    # batched sublane-sublane contraction: [bc, K, 128·nch]
    Xg = jax.lax.dot_general(
        oht, G, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)

    ksub = jax.lax.broadcasted_iota(jnp.int32, (bc, K, 128), 1
                                    ).astype(jnp.float32)
    im1 = Xg[:, :, 128 * nv: 128 * (nv + 1)]
    # incl ≤ k via the mod-256 window: t ≡ k − incl (mod 256) with the true
    # difference in [−128, 127] → true iff t ∈ [0, 128) or t < −128
    t = ksub - im1
    tf = ((t >= 0.0) & (t < 128.0)).astype(jnp.float32) \
        + (t < -128.0).astype(jnp.float32)
    lane_k = jnp.sum(tf, axis=2, keepdims=True)           # [bc, K, 1]

    lio = jax.lax.broadcasted_iota(jnp.int32, (bc, K, 128), 2
                                   ).astype(jnp.float32)
    sel = (lio == lane_k).astype(jnp.float32)
    rows = [jnp.sum(Xg[:, :, 128 * i: 128 * (i + 1)] * sel, axis=2,
                    keepdims=True) for i in range(nv)]    # value channel(s)
    rows.append(Xg[:, :, 128 * (nv + 1): 128 * (nv + 1) + 1])  # b_k
    rows.append(lane_k)
    S = jnp.concatenate([r.astype(jnp.bfloat16) for r in rows], axis=2)

    # k-on-sublanes → k-on-lanes: tiny per-chunk transpose dot against I_K
    eyeK = (jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
            ).astype(jnp.bfloat16)
    T = jax.lax.dot_general(
        S, eyeK, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [bc, nv+2, K]
    rio = jax.lax.broadcasted_iota(jnp.int32, (1, T.shape[1], 1), 1)
    ov_ref[...] = jnp.sum(jnp.where(rio < nv, T, 0.0), axis=1)
    oi_ref[...] = jnp.sum(
        jnp.where(rio == nv, T * 128.0,
                  jnp.where(rio == nv + 1, T, 0.0)), axis=1).astype(jnp.int32)


def _kernel(x_ref, ov_ref, oi_ref, *, bc, L, K, mant_bits, val_channels,
            compaction, F_real=None, F_pad=None):
    # kernel-engineering probe: PCAUDIO_SELECT_PROFILE=searchonly|scatteronly
    # strips a stage (WRONG results, timing only) to attribute kernel time
    import os
    _profile = os.environ.get("PCAUDIO_SELECT_PROFILE", "")
    # Mosaic shape-cast rules (probed): 3D→2D minor-dims collapse of f32
    # vectors is supported ([bc,nb,128]→[bc,L], the v1-proven class), but a
    # collapse FUSED with a unit-dim expand ([bc,nb,128]→[bc,L,1] in one
    # tpu.reshape) is not — so the block arrives 3D, every 2D view is a
    # plain collapse, and all lane-1 expands happen on elementwise results.
    nb = L // 128
    x3 = x_ref[...].astype(jnp.float32)                   # [bc, nb, 128]
    x = x3.reshape(bc, L)

    ones128 = jnp.ones((128, 128), jnp.bfloat16)

    def lane_total(part):
        """[..., 128] per-lane partial counts (each < 2^8, bf16-exact) →
        replicated lane totals (f32 accumulation, exact)."""
        shp = part.shape
        c = jnp.dot(part.astype(jnp.bfloat16).reshape(-1, 128), ones128,
                    preferred_element_type=jnp.float32)
        return c.reshape(shp)

    def count_ge(cand):
        """cand [nd, bc, 128] thresholds → replicated counts of x ≥ t.

        The compare mask extends to f32, not bf16: a bf16 `where` on the
        4D mask needs an i1 relayout ((8,128)→(16,128) tiles) Mosaic
        cannot do ("Invalid relayout: non-singleton dim replicated in
        destination"), and the f32 sublane reduction is not the
        bottleneck."""
        m = (x3[None] >= cand[:, :, None, :]).astype(jnp.float32)
        return lane_total(jnp.sum(m, axis=2))

    def pick(tau, cand):
        """Select the largest candidate threshold still covering ≥ K
        values (monotone: cand is increasing in d, counts decreasing)."""
        ok = (count_ge(cand) >= K).astype(jnp.float32)    # [nd, bc, 128]
        nd = cand.shape[0]
        if nd == 1:
            return jnp.where(ok[0] > 0.0, cand[0], tau)
        # sel_d = ok_d − ok_{d+1} is one-hot on the largest passing digit.
        # Blend through `where`, not multiplication: high exponent-digit
        # candidates overflow to +inf (e.g. 2^192 for d=3·64) and inf·0
        # would poison the sum with NaN; an inf candidate simply never
        # passes the count test (finite inputs) and must drop out cleanly.
        sel = ok - jnp.concatenate(
            [ok[1:], jnp.zeros((1, bc, 128), jnp.float32)], axis=0)
        return tau * (1.0 - ok[0]) + jnp.sum(
            jnp.where(sel > 0.0, cand, 0.0), axis=0)

    # ---- 1) exact K-th largest value per chunk: MSB→LSB bit search ------
    # Radix 2: binary search minimizes full-grid probe compares (31 — one
    # per code bit — vs 46 for radix 4, 76 for radix 8); the probes' x-wide
    # compares dominate, the per-round fixed ops don't.  Exponent offset
    # 0..255 from 2^-126 via eight doubling rounds; candidate = tau·2^step.
    # Candidates are built INCREMENTALLY (c = tau·2^step with 2^step a
    # finite f32 constant, each product an exact power of two): a closed
    # form 2^(Σ bits) constant would overflow f32 mid-range.  A candidate
    # that legitimately exceeds f32 max becomes inf and simply never passes
    # the count test (finite inputs), dropping out via pick's `where`.
    # (2^128 itself is NOT a finite f32 — the top bit multiplies twice by
    # 2^64; both factors are exact and tau = 2^-126 keeps the product
    # finite exactly when the bit is legitimately reachable.)
    tau = jnp.full((bc, 128), 2.0 ** -126, jnp.float32)
    tau = pick(tau, (tau * float(2.0 ** 64) * float(2.0 ** 64))[None])
    for step in (64, 32, 16, 8, 4, 2, 1):
        tau = pick(tau, (tau * float(2.0 ** step))[None])
    # Mantissa bits (msb-first), one probe each: candidate = tau + scale.
    # After the exponent rounds tau is exactly 2^(e−127) (no mantissa bits
    # set), so scale = tau·2^(s−23) stays an exact power of two and every
    # tau + scale is exact.  ``mant_bits`` is the INPUT dtype's mantissa
    # width: bf16 inputs (the serving spectrogram grid) have 7 mantissa
    # bits, so rounds 8..23 can never flip a bit — 16 of 31 full-grid
    # probes skipped.
    scale = tau * 0.5
    for _ in range(mant_bits):
        tau = pick(tau, (tau + scale)[None])
        scale = scale * 0.5

    # all-(near)zero chunks: no probe reached K values → threshold 0
    cntV = count_ge(tau[None])[0]
    tau_b = jnp.where(cntV >= K, tau, 0.0)[:, None, :]    # [bc, 1, 128]

    if _profile == "searchonly":
        ov_ref[...] = jnp.broadcast_to(tau[:, :K], (bc, K))
        oi_ref[...] = jnp.broadcast_to(
            cntV[:, :K].astype(jnp.int32), (bc, K))
        return
    if _profile == "scatteronly":
        tau_b = jnp.full((bc, 1, 128), 0.5, jnp.float32)

    # ---- 2+3) winners + flat-order ranks ----
    # Non-lane-multiple F support (framewise F=1025): the flat axis is the
    # PADDED [Nt, F_pad] layout with 0.0 pad lanes.  The threshold search
    # needs no masking — every probe candidate is ≥ 2^-126 > 0, so pads
    # never pass ``x ≥ cand`` — and pads can't be gt-winners (x > τ fails
    # at τ ≥ 0).  The ONLY leak is the degenerate τ=0 tie case (pads tie
    # with real zeros), closed by ANDing the tie mask with the static
    # lane-validity pattern: one compare over L on a single pass.  Real
    # elements keep their relative flat order across the padded layout, so
    # take-first-on-ties matches ``lax.top_k`` on the unpadded array.
    w_gt = x3 > tau_b
    tie = x3 == tau_b
    if F_real is not None:
        flat_io = (jax.lax.broadcasted_iota(jnp.int32, (bc, nb, 128), 1) * 128
                   + jax.lax.broadcasted_iota(jnp.int32, (bc, nb, 128), 2))
        tie = tie & ((flat_io % F_pad) < F_real)
    need = K - lane_total(jnp.sum(w_gt.astype(jnp.float32), axis=1))

    lane = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    lane_t = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    ltF = (lane < lane_t).astype(jnp.bfloat16)            # strict lower

    def ex_prefix(m):
        """m [n, nb, 128] {0,1} → exclusive flat-order prefix counts
        (independently per leading row).  In-block prefix by strict-lower
        matmul; cross-block carry by a Kogge–Stone scan of replicated
        block totals (Mosaic has no cumsum lowering; ``pltpu.roll`` +
        iota masks are the supported spelling).  All exact: 0/1 bf16
        operands, f32 accumulation, integer adds."""
        n = m.shape[0]
        riota = jax.lax.broadcasted_iota(jnp.int32, (n, nb, 128), 1)
        mb = m.astype(jnp.bfloat16).reshape(n * nb, 128)
        pre = jnp.dot(mb, ltF, preferred_element_type=jnp.float32)
        tot = jnp.dot(mb, ones128, preferred_element_type=jnp.float32)
        tot3 = tot.reshape(n, nb, 128)
        inc = tot3
        s = 1
        while s < nb:
            shifted = pltpu.roll(inc, s, axis=1)
            inc = inc + jnp.where(riota >= s, shifted, 0.0)
            s *= 2
        return pre.reshape(n, nb, 128) + (inc - tot3)

    # ONE stacked prefix scan for both masks (halves the Kogge–Stone
    # dispatch chains): rank decomposes as
    #   rank_i = #gt-winners before i + #taken-ties before i
    #          = gt_rank_i + min(tie_rank_i, need)
    # because the taken ties are exactly the FIRST ``need`` ties in flat
    # order — the prefix count of that subset at i is min(tie_rank_i, need).
    both = ex_prefix(jnp.concatenate(
        [w_gt.astype(jnp.float32), tie.astype(jnp.float32)], axis=0))
    gt_rank, tie_rank = both[:bc], both[bc:]
    w = w_gt | (tie & (tie_rank < need[:, None, :]))
    rank = gt_rank + jnp.minimum(tie_rank, need[:, None, :])

    if compaction == "gather":
        _compact_gather(x3, w, rank, ov_ref, oi_ref, bc=bc, L=L, K=K,
                        val_channels=val_channels)
        return

    # ---- 4) one-hot scatter compaction ----
    # Winner mask folded into the rank key (non-winners → −1, matching no
    # output column; rank ≥ K likewise never matches, which also truncates
    # the degenerate overfull-at-τ=0 case to first-K-in-flat-order).
    # Built elementwise in 2D (f32-collapse views of rank / w) so the later
    # [:, lo:hi, None] expand never fuses with a collapse cast.
    rank2 = rank.reshape(bc, L)
    w2 = w.astype(jnp.float32).reshape(bc, L)
    rank_key = jnp.where(w2 > 0.0, rank2, -1.0)

    # bf16-exact payload channels: f32 value split bf16x3 (reconstructed by
    # exact f32 adds), flat index split into (idx//256, idx%256) < 256.
    # bf16 INPUTS (the serving grid) are single-channel-exact — h2 = h3 = 0
    # identically — so the scatter carries 3 channels instead of 5, cutting
    # the batched compaction dot's row count 40 → 24 (its cost scales with
    # rows at fixed contraction length).
    fi = jax.lax.broadcasted_iota(jnp.int32, (bc, L), 1)
    ihi = (fi >> 8).astype(jnp.float32)
    ilo = (fi & 255).astype(jnp.float32)
    if val_channels == 1:
        chans = [x, ihi, ilo]                             # 3 × [bc, L] f32
    else:
        h1 = x.astype(jnp.bfloat16).astype(jnp.float32)
        r1 = x - h1
        h2 = r1.astype(jnp.bfloat16).astype(jnp.float32)
        h3 = r1 - h2
        chans = [h1, h2, h3, ihi, ilo]                    # 5 × [bc, L] f32

    # Factored one-hot scatter: rank = rhi·8 + rlo with rhi < Khi = K/8,
    # rlo < 8.  Building the full [K, piece] one-hot costs K·piece compares
    # per chunk — the kernel's single largest VPU term.  The digit one-hots
    # cost (Khi + 8)·piece compares plus 5·8·piece bf16 products (~3x
    # fewer ops at K = 128): R[(ch,rlo), l] = payload_ch[l]·(rlo_l == lo)
    # rides the same minor-axis contraction against Shi[(hi), l], giving
    # out2[(ch,rlo), hi]; the (hi, rlo) → k unpack is one constant one-hot
    # matmul (lane expand Khi→K) plus two constant-masked sublane
    # reductions.  Exactness: every out2 bin receives at most one product
    # (ranks are unique); all payload channels are bf16-exact; the expand
    # matmul is one-hot per k (no summation).  Non-winners carry
    # rank_key = −1 → rhi = −1 (floor(−1/8)) which matches no Shi row.
    # f32 equality compares throughout: Mosaic rejects bf16 cmpf ("Target
    # does not support this comparison") and tpu.iota is integer-only, so
    # iotas are int32 extended to f32; digits are small integers — the f32
    # equality is exact.
    assert K % 8 == 0, "factored scatter needs K % 8 == 0"
    Khi = K // 8
    rhi = jnp.floor(rank_key * 0.125)                     # [bc, L]
    rlo = rank_key - rhi * 8.0

    # Piece the flat axis so the stacked scatter tensors stay VMEM-sized
    # (≤ ~24 MB bf16); piece lengths are 128-aligned and the last piece
    # covers the remainder — every flat element is scattered.
    nch = len(chans)
    nrow = nch * 8
    budget = (24 * 1024 * 1024) // (bc * (nrow + 8 + max(Khi, 8)) * 2)
    piece = max(128, (budget // 128) * 128)
    out2 = jnp.zeros((bc, nrow, Khi), jnp.float32)
    lo = 0
    while lo < L:
        hi = min(lo + piece, L)
        lo_iota = jax.lax.broadcasted_iota(
            jnp.int32, (bc, 8, hi - lo), 1).astype(jnp.float32)
        Slo = (jnp.expand_dims(rlo[:, lo:hi], 1) == lo_iota
               ).astype(jnp.bfloat16)                     # [bc, 8, piece]
        hi_iota = jax.lax.broadcasted_iota(
            jnp.int32, (bc, Khi, hi - lo), 1).astype(jnp.float32)
        Shi = (jnp.expand_dims(rhi[:, lo:hi], 1) == hi_iota
               ).astype(jnp.bfloat16)                     # [bc, Khi, piece]
        # slice-then-expand: the fused ``c[:, None, lo:hi]`` form lowers
        # through Mosaic's gather rule and crashes for partial pieces
        R = jnp.concatenate(
            [jnp.expand_dims(c[:, lo:hi], 1).astype(jnp.bfloat16) * Slo
             for c in chans], axis=1)                     # [bc, nrow, piece]
        out2 = out2 + jax.lax.dot_general(
            R, Shi,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)           # [bc, nrow, Khi]
        lo = hi

    # (ch, rlo, hi) → (ch, k = hi·8 + rlo): constant one-hot lane expand +
    # constant-masked sublane reductions (exact — one term per output).
    kk = jax.lax.broadcasted_iota(jnp.int32, (Khi, K), 1)
    hh = jax.lax.broadcasted_iota(jnp.int32, (Khi, K), 0)
    mexp = (hh == kk // 8).astype(jnp.bfloat16)           # [Khi, K]
    T = jax.lax.dot_general(
        out2.astype(jnp.bfloat16), mexp,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [bc, nrow, K]
    row_ch = jax.lax.broadcasted_iota(jnp.int32, (nrow, K), 0) // 8
    row_lo = jax.lax.broadcasted_iota(jnp.int32, (nrow, K), 0) % 8
    k_lo = jax.lax.broadcasted_iota(jnp.int32, (nrow, K), 1) % 8
    lo_hit = (row_lo == k_lo).astype(jnp.float32)
    sel_v = jnp.where(row_ch < nch - 2, lo_hit, 0.0)      # value channel(s)
    sel_i = jnp.where(row_ch == nch - 2, 256.0 * lo_hit,
                      jnp.where(row_ch == nch - 1, lo_hit, 0.0))
    ov_ref[...] = jnp.sum(T * sel_v[None], axis=1)
    oi_ref[...] = jnp.sum(T * sel_i[None], axis=1).astype(jnp.int32)


def exact_topk_supported(K: int, F: int) -> bool:
    """The kernel's applicability envelope, for callers deciding between
    this and the XLA two-stage top-k: K ≤ 256 (bf16 scatter-rank budget).
    Any F ≥ 1 works — non-lane-multiple F (framewise 1025) rides a
    zero-padded lane layout with a tie-mask fix (see ``_kernel``).  Values
    must also be non-negative (true for squared magnitudes by
    construction) — that part can't be checked statically."""
    return K <= 256 and F >= 1


def exact_topk_chunks(
    mags: Array,
    K: int,
    *,
    block_c: int = 32,
    compaction: str = None,
    interpret=None,
) -> Tuple[Array, Array]:
    """Exact per-chunk top-K of non-negative magnitudes.

    Args:
      mags: ``[N, Nt, F]`` non-negative values (any float dtype).
      K: selection budget (≤ Nt·F; multiples of 128 keep full lanes).
      compaction: "gather" (slot-k finds its winner, small full-lane dots)
        or "scatter" (one-hot rank matrices over the flat axis).  Default
        (None / PCAUDIO_SELECT_COMPACT=auto) picks by input dtype from
        chip measurements at serving shape (22k chunks of [10, 512],
        K=128): bf16 grids run 13.6 ms scatter vs 13.9 gather (the single
        payload channel keeps the compaction dot small), f32 grids 19.1
        gather vs 21.7 scatter (gather dodges the 5-channel scatter rows).

    Returns ``(values [N, K] f32, flat_indices [N, K] int32)`` — the exact
    ``jax.lax.top_k`` SET over the row-major flattening, in ascending
    flat-index order.
    """
    import os
    if compaction is None:
        compaction = os.environ.get("PCAUDIO_SELECT_COMPACT", "auto")
    N, Nt, F = mags.shape
    assert K <= Nt * F
    # non-lane-multiple F: zero-pad each frame row to the next 128 multiple;
    # the kernel masks pad lanes out of the tie cut (the threshold search
    # is pad-immune — probes are ≥ 2^-126 > 0.0) and the flat indices are
    # unmapped below.  Pads must sort BELOW every real value, which holds
    # because the values are non-negative.
    F_pad = F + (-F) % 128
    if F_pad != F:
        mags = jnp.pad(mags, ((0, 0), (0, 0), (0, F_pad - F)))
    L = Nt * F_pad
    # mantissa probe rounds follow the INPUT dtype's precision (exactness
    # is relative to the values actually handed in): bf16 7, f16 10, f32 23
    mant_bits = {jnp.bfloat16.dtype: 7, jnp.float16.dtype: 10}.get(
        jnp.dtype(mags.dtype), 23)
    if compaction == "auto":
        compaction = "scatter" if mant_bits <= 10 else "gather"
    assert K <= 256, "bf16 scatter ranks require K <= 256"
    nb = L // 128
    mags = mags.reshape(N, nb, 128)
    pad = (-N) % block_c
    if pad:
        mags = jnp.pad(mags, ((0, pad), (0, 0), (0, 0)))
    Np = N + pad

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    kern = functools.partial(_kernel, bc=block_c, L=L, K=K,
                             mant_bits=mant_bits,
                             val_channels=1 if mant_bits <= 10 else 3,
                             compaction=compaction,
                             F_real=F if F_pad != F else None, F_pad=F_pad)
    vals, idx = pl.pallas_call(
        kern,
        grid=(Np // block_c,),
        out_shape=(
            jax.ShapeDtypeStruct((Np, K), jnp.float32),
            jax.ShapeDtypeStruct((Np, K), jnp.int32),
        ),
        in_specs=[pl.BlockSpec((block_c, nb, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((block_c, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_c, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )(mags)
    if F_pad != F:
        # padded flat index → original [Nt, F] row-major flat index
        # (winners are never pad lanes, so idx % F_pad < F always)
        idx = (idx // F_pad) * F + (idx % F_pad)
    return vals[:N], idx[:N]
