"""Experiment-harness tests: reference JSON schemas, determinism, and
subsampling-curve sanity on synthetic audio + tiny models.

(Full numeric parity against Code/paper_plots/*.json needs the ESC-50 audio,
which is not in this image — SURVEY.md §7; these tests pin the harness
structure and semantics instead.)
"""
import json

import numpy as np

import jax
import jax.numpy as jnp

from pcaudio.eval.experiments import (
    default_list_K,
    default_list_N,
    framewise_expt1,
    framewise_expt2,
    make_3st_chunk_classifier,
    make_cloud_classifier,
    make_cnn_chunk_classifier,
    make_fb_frame_classifier,
    make_fst_frame_classifier,
    rebut_importance_expt,
    temporal_expt1,
    temporal_expt2,
)
from pcaudio.nn import ST, BaselineFF, CNNClassifier

FS = 8000
NFFT = 256


def _audio(B=3, seconds=0.5):
    rng = np.random.default_rng(0)
    n = int(FS * seconds)
    L = 8192
    w = np.zeros((B, L), np.float32)
    for i in range(B):
        f0 = 300.0 * (i + 1)
        w[i, :n] = 0.3 * np.sin(2 * np.pi * f0 * np.arange(n) / FS)
    labels = np.arange(B) % 2
    return jnp.asarray(w), jnp.full((B,), n, jnp.int32), jnp.asarray(labels)


def _st_model(dim_input):
    model = ST(dim_input=dim_input, dim_output=2, num_inds=4, dim_hidden=8,
               num_heads=2)
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, dim_input)))
    return model, params


def test_default_lists_match_reference():
    # Code/pceval.py:56 with Nfft=2048
    assert default_list_N(2048)[:5] == [4096, 3072, 2560, 2150, 2048]
    assert default_list_N(2048, include_larger=False)[0] == 2048
    ks = default_list_K(1024)
    assert ks[0] == 1 and ks[1] == 51 and ks[-1] == 1024
    ks5 = default_list_K(5120)
    assert ks5[-1] == 5120 and ks5[-2] == 5051


def test_framewise_expt1_schema():
    waves, lengths, labels = _audio()
    model, params = _st_model(2)
    out = framewise_expt1(
        make_fst_frame_classifier(model, params), waves, lengths, labels,
        fsog=FS, Nfft=NFFT, list_Fs=[FS, 0.5 * FS], list_N=[NFFT, NFFT // 2],
    )
    s = json.dumps(out)
    d = json.loads(s)
    assert set(d.keys()) == {"data", "list_Fs", "list_N"}
    assert set(d["data"].keys()) == {"8000", "4000.0"}  # reference key format
    assert all(len(v) == 2 for v in d["data"].values())
    assert all(0.0 <= a <= 1.0 for v in d["data"].values() for a in v)


def test_framewise_expt1_fb_fixed_nfft():
    waves, lengths, labels = _audio()
    model = BaselineFF(layer_dims=(NFFT // 2 + 1, 16), nclasses=2)
    params = model.init(jax.random.key(0), jnp.zeros((1, NFFT // 2 + 1)))
    out = framewise_expt1(
        make_fb_frame_classifier(model, params), waves, lengths, labels,
        fsog=FS, Nfft=NFFT, fixed_nfft=True,
        list_Fs=[FS], list_N=[NFFT, NFFT // 2],
    )
    assert len(out["data"][FS]) == 2  # input dim stays fixed across the sweep


def test_temporal_expt1_schema():
    waves, lengths, labels = _audio()
    model, params = _st_model(3)
    out = temporal_expt1(
        make_3st_chunk_classifier(model, params), waves, lengths, labels,
        fsog=FS, Nfft=NFFT, Ntemp=4,
        list_Fs=[FS], list_N=[NFFT, NFFT // 2],
    )
    assert len(out["data"][FS]) == 2


def test_framewise_expt2_cloud_and_replace():
    waves, lengths, labels = _audio()
    model, params = _st_model(2)
    rnd, mx = framewise_expt2(
        None, make_cloud_classifier(model, params), waves, lengths, labels,
        mode="cloud", fsog=FS, Nfft=NFFT, list_K=[8, NFFT // 2], nruns=3,
    )
    for d in (rnd, mx):
        assert set(d.keys()) == {"data", "list_K"}
        assert set(d["data"].keys()) == {8, NFFT // 2}
    assert all(len(v) == 2 for v in rnd["data"].values())
    assert all(v[1] == 0 for v in mx["data"].values())  # top-K: var slot is 0

    fb = BaselineFF(layer_dims=(NFFT // 2 + 1, 16), nclasses=2)
    fbp = fb.init(jax.random.key(0), jnp.zeros((1, NFFT // 2 + 1)))
    rnd2, mx2 = framewise_expt2(
        make_fb_frame_classifier(fb, fbp), None, waves, lengths, labels,
        mode="replace", fsog=FS, Nfft=NFFT, list_K=[8], nruns=2,
    )
    assert 8 in rnd2["data"] and 8 in mx2["data"]


def test_expt2_full_K_equals_no_subsampling():
    """K = full cloud must reproduce the unsubsampled accuracy (top-K of
    everything is everything)."""
    waves, lengths, labels = _audio()
    model, params = _st_model(2)
    _, mx = framewise_expt2(
        None, make_cloud_classifier(model, params), waves, lengths, labels,
        mode="cloud", fsog=FS, Nfft=NFFT, list_K=[NFFT // 2 + 1], nruns=1,
    )
    base = framewise_expt1(
        make_fst_frame_classifier(model, params), waves, lengths, labels,
        fsog=FS, Nfft=NFFT, list_Fs=[FS], list_N=[NFFT],
    )
    assert abs(mx["data"][NFFT // 2 + 1][0] - base["data"][FS][0]) < 1e-9


def test_rank_mask_matches_topk_selection():
    """The engine's rank mask must select exactly jax.lax.top_k's subset
    (ties included) and, for replace mode, produce bit-identical inputs to
    the zeroed grid."""
    from pcaudio.eval.experiments import _ranks_desc
    from pcaudio.ops.subsample import top_k_replace

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((7, 33)).astype(np.float32))
    # inject ties to exercise the tie-break rule
    x = x.at[:, 10].set(x[:, 3])
    for K in (1, 5, 17, 33):
        _, idx = jax.lax.top_k(x, K)
        keep_ref = np.zeros(x.shape, bool)
        np.put_along_axis(keep_ref, np.asarray(idx), True, axis=-1)
        keep = np.asarray(_ranks_desc(x) < K)
        np.testing.assert_array_equal(keep, keep_ref)
        np.testing.assert_array_equal(
            np.asarray(jnp.where(keep, x, 0.0)),
            np.asarray(top_k_replace(x, K)))


def test_masked_topk_counts_match_subset_eval():
    """Masked rank-top-K classification must agree with explicitly gathering
    the top-K subset and classifying it dense (argmax agreement)."""
    from pcaudio.eval.experiments import _prefix_mask_counts
    from pcaudio.ops.subsample import top_k_points

    model, params = _st_model(2)
    rng = np.random.default_rng(2)
    B, n = 12, 40
    clouds = jnp.asarray(rng.standard_normal((B, n, 2)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 2, B).astype(np.int32))
    valid = jnp.ones((B,), bool)
    Ks = [3, 11, n]
    cmax, _ = jax.jit(_prefix_mask_counts, static_argnums=(0, 7))(
        lambda c, keep: model.apply(params, c, mask=keep),
        clouds, clouds[..., -1], labels, valid,
        jax.random.key(0), jnp.asarray(Ks, jnp.int32), 1)
    for j, K in enumerate(Ks):
        sub = top_k_points(clouds, K)
        lg = model.apply(params, sub)
        want = int(jnp.sum((jnp.argmax(lg, -1) == labels)))
        assert int(cmax[j]) == want, (K, int(cmax[j]), want)


def test_expt1_prefetch_equals_serial(monkeypatch):
    waves, lengths, labels = _audio()
    model, params = _st_model(2)
    kw = dict(fsog=FS, Nfft=NFFT, list_Fs=[FS, 0.5 * FS],
              list_N=[NFFT, NFFT // 2])
    clf = make_fst_frame_classifier(model, params)
    monkeypatch.setenv("PCAUDIO_EVAL_COMPILE_WORKERS", "1")
    serial = framewise_expt1(clf, waves, lengths, labels, **kw)
    monkeypatch.setenv("PCAUDIO_EVAL_COMPILE_WORKERS", "3")
    par = framewise_expt1(clf, waves, lengths, labels, **kw)
    assert serial == par


def test_temporal_expt2_and_rebut():
    waves, lengths, labels = _audio()
    model, params = _st_model(3)
    rnd, mx = temporal_expt2(
        make_cloud_classifier(model, params), None, waves, lengths, labels,
        mode="cloud", fsog=FS, Nfft=NFFT, Ntemp=4, list_K=[16], nruns=2,
    )
    assert 16 in rnd["data"]

    cnn = CNNClassifier(Nt=4, Nf=NFFT // 2, layer_dims=(NFFT // 2, 16), nclass=2)
    cnnp = cnn.init(jax.random.key(0), jnp.zeros((1, 4, NFFT // 2)))
    rnd2, mx2 = temporal_expt2(
        None, make_cnn_chunk_classifier(cnn, cnnp), waves, lengths, labels,
        mode="replace", fsog=FS, Nfft=NFFT, Ntemp=4, list_K=[16], nruns=2,
    )
    assert 16 in mx2["data"]

    rr, rm = rebut_importance_expt(
        make_cloud_classifier(model, params), waves, lengths, labels,
        fsog=FS, Nfft=NFFT, Ntemp=4, list_winF=[8], list_K=[16], nruns=1,
    )
    d = json.loads(json.dumps(rm))
    assert set(d["data"].keys()) == {"8"}
    assert set(d["data"]["8"].keys()) == {"16"}


def test_k_chunking_bit_identical(monkeypatch):
    """Host-side K-axis chunking (bounds single-dispatch duration on the
    tunneled chip) must be bit-identical to one program over all Ks: the
    per-microbatch key — hence the noise and its ranks — is chunk-invariant."""
    waves, lengths, labels = _audio()
    model, params = _st_model(2)
    kw = dict(mode="cloud", fsog=FS, Nfft=NFFT,
              list_K=[4, 8, 16, 32, 64, NFFT // 2], nruns=3)
    monkeypatch.setenv("PCAUDIO_EVAL_K_CHUNK", "1000")
    rnd_a, mx_a = framewise_expt2(
        None, make_cloud_classifier(model, params), waves, lengths, labels, **kw)
    monkeypatch.setenv("PCAUDIO_EVAL_K_CHUNK", "4")  # 6 Ks -> 4+2(padded)
    rnd_b, mx_b = framewise_expt2(
        None, make_cloud_classifier(model, params), waves, lengths, labels, **kw)
    assert rnd_a == rnd_b
    assert mx_a == mx_b


def test_fused_parity_gate_on_real_featurized_data(tmp_path):
    """The CLI's fused-attention gate must exercise REAL featurized sweep
    data (masked + unmasked) and report agreement counts (VERDICT r4 #5)."""
    from pcaudio.cli import _fused_parity_gate
    from pcaudio.core.config import ARCH_3ST, ExperimentConfig

    cfg = ExperimentConfig(architecture=ARCH_3ST, sampling_rate=FS,
                           window_size=NFFT, Ntemp=4, dhidden=8, nheads=2,
                           ninds=4, classes=2)
    model = cfg.build_model()
    fmodel = cfg.build_model(fused_attn=True)
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, 3)))
    waves, lengths, _ = _audio()
    ok, info = _fused_parity_gate(cfg, model, fmodel, params,
                                  np.asarray(waves), np.asarray(lengths))
    assert info["agreement"][1] == 2 * info["rows"] > 0
    assert info["agreement"][0] <= info["agreement"][1]
    assert ok == (info["agreement"][0] == info["agreement"][1])


def test_dump_with_provenance(tmp_path):
    from pcaudio.utils.metrics import dump_with_provenance

    p = str(tmp_path / "X_expt1.json")
    side = dump_with_provenance(
        {"data": {44100: [0.5]}}, p,
        {"engine": "fused", "fused_gate": {"passed": True,
                                           "agreement": [512, 512]}})
    # the reference artifact is untouched by the side-channel
    assert json.load(open(p)) == {"data": {"44100": [0.5]}}
    assert side.endswith("X_expt1.provenance.json")
    prov = json.load(open(side))
    assert prov["fused_gate"]["agreement"] == [512, 512]
