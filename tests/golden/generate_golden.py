"""Generate golden tensors from the PyTorch reference for parity tests.

Runs the reference implementation (read-only at $PCAUDIO_REFERENCE, default
/root/reference) on fixed-seed random inputs and dumps (state_dict, input,
output) triples as .npz.  The .npz files are committed so the test suite does
NOT need the reference checkout or torch to run; re-run this script only to
regenerate.

Usage:  python tests/golden/generate_golden.py
"""
import importlib.util
import os
import sys

import numpy as np
import torch

REF = os.environ.get("PCAUDIO_REFERENCE", "/root/reference")
sys.path.insert(0, os.path.join(REF, "set_transformer-master"))


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


ref_modules = _load("ref_modules", os.path.join(REF, "set_transformer-master", "modules.py"))
ref_models = _load("ref_code_models", os.path.join(REF, "Code", "models.py"))
st_models = _load("ref_st_models", os.path.join(REF, "set_transformer-master", "models.py"))

OUT = os.path.dirname(os.path.abspath(__file__))


def dump(name, module, inputs, out):
    sd = {f"sd.{k}": v.detach().numpy() for k, v in module.state_dict().items()}
    arrays = {f"in.{k}": v.detach().numpy() for k, v in inputs.items()}
    arrays["out"] = out.detach().numpy()
    np.savez(os.path.join(OUT, f"{name}.npz"), **sd, **arrays)
    print(f"wrote {name}.npz  out shape {tuple(out.shape)}")


def main():
    torch.manual_seed(0)
    rng = np.random.default_rng(0)

    # --- MAB (plain + ln) ---
    for ln in (False, True):
        m = ref_modules.MAB(dim_Q=5, dim_K=7, dim_V=8, num_heads=2, ln=ln).eval()
        Q = torch.tensor(rng.standard_normal((3, 11, 5)), dtype=torch.float32)
        K = torch.tensor(rng.standard_normal((3, 13, 7)), dtype=torch.float32)
        with torch.no_grad():
            y = m(Q, K)
        dump(f"mab_ln{int(ln)}", m, {"Q": Q, "K": K}, y)

    # --- SAB ---
    m = ref_modules.SAB(dim_in=6, dim_out=8, num_heads=4).eval()
    X = torch.tensor(rng.standard_normal((2, 9, 6)), dtype=torch.float32)
    with torch.no_grad():
        y = m(X)
    dump("sab", m, {"X": X}, y)

    # --- ISAB ---
    m = ref_modules.ISAB(dim_in=3, dim_out=8, num_heads=2, num_inds=5).eval()
    X = torch.tensor(rng.standard_normal((2, 17, 3)), dtype=torch.float32)
    with torch.no_grad():
        y = m(X)
    dump("isab", m, {"X": X}, y)

    # --- PMA ---
    m = ref_modules.PMA(dim=8, num_heads=2, num_seeds=3).eval()
    X = torch.tensor(rng.standard_normal((2, 14, 8)), dtype=torch.float32)
    with torch.no_grad():
        y = m(X)
    dump("pma", m, {"X": X}, y)

    # --- ST at the FST training config (Code/settransformer.py:81-85) ---
    m = ref_models.ST(dim_input=2, num_outputs=1, dim_output=10,
                      num_inds=64, dim_hidden=64, num_heads=8).eval()
    X = torch.tensor(rng.standard_normal((4, 50, 2)), dtype=torch.float32)
    with torch.no_grad():
        y = m(X)
    dump("st_fst", m, {"X": X}, y)

    # --- ST at the 3ST training config (Code/settransformertemp.py:99) ---
    m = ref_models.ST(dim_input=3, num_outputs=1, dim_output=10,
                      num_inds=64, dim_hidden=64, num_heads=8).eval()
    X = torch.tensor(rng.standard_normal((4, 60, 3)), dtype=torch.float32)
    with torch.no_grad():
        y = m(X)
    dump("st_3st", m, {"X": X}, y)

    # --- baseline_ff (Code/baseline.py:77-80 config) ---
    m = ref_models.baseline_ff(layer_dims=[1025, 513, 256], nclasses=10).eval()
    x = torch.tensor(rng.standard_normal((4, 1025)), dtype=torch.float32)
    with torch.no_grad():
        y = m(x)
    dump("baseline_ff", m, {"x": x}, y)

    # --- CNN_classifier (Code/baselinetemp.py:92-96 config) ---
    m = ref_models.CNN_classifier(Nt=10, Nf=512, layer_dims=[512, 256, 100],
                                  nclass=10).eval()
    x = torch.tensor(rng.standard_normal((4, 10, 512)), dtype=torch.float32)
    with torch.no_grad():
        y = m(x)
    dump("cnn_temp", m, {"x": x}, y)

    # --- generic SetTransformer + DeepSet (set_transformer-master/models.py) ---
    m = st_models.SetTransformer(dim_input=3, num_outputs=2, dim_output=5,
                                 num_inds=8, dim_hidden=16, num_heads=4).eval()
    X = torch.tensor(rng.standard_normal((2, 20, 3)), dtype=torch.float32)
    with torch.no_grad():
        y = m(X)
    dump("set_transformer", m, {"X": X}, y)

    m = st_models.DeepSet(dim_input=3, num_outputs=2, dim_output=5,
                          dim_hidden=16).eval()
    with torch.no_grad():
        y = m(X)
    dump("deepset", m, {"X": X}, y)

    ops_golden(rng)


def ops_golden(rng):
    """Deterministic point-cloud op outputs from the reference dataset /
    utils code (Code/dataset.py, Code/utils.py)."""
    # Code/utils.py imports prettytable (not in this image) for its param
    # counter; stub it — we only use the numpy subsampling functions.
    import types
    pt = types.ModuleType("prettytable")
    pt.PrettyTable = object
    sys.modules.setdefault("prettytable", pt)
    ref_dataset = _load("ref_dataset", os.path.join(REF, "Code", "dataset.py"))
    ref_utils = _load("ref_utils", os.path.join(REF, "Code", "utils.py"))

    out = {}
    # framewise: ESC_pc cloud build + pc_maxK + pc_maxK_replace
    F, T = 1025, 7
    x = rng.standard_normal((F, T)).astype(np.float32)  # [freq, frames]
    farr = (np.linspace(0, 22050, F) / 44100).astype(np.float32)
    y = np.arange(T) % 3
    ds = ref_dataset.ESC_pc(x=x, y=y, farr=farr)
    out["pc_frames"] = np.stack([ds[i][0].numpy() for i in range(T)])
    sub_x, sub_f = ref_utils.pc_maxK(x, farr, 100)
    ds_ss = ref_dataset.ESC_pc_ss(x=sub_x, y=y, farr=sub_f)
    out["pc_maxk_clouds"] = np.stack([ds_ss[i][0].numpy() for i in range(T)])
    out["pc_maxk_replace"] = ref_utils.pc_maxK_replace(x, 100).astype(np.float32)
    out["x_frames"] = x
    out["farr"] = farr

    # temporal: ESC_pc_temp cloud build, maxKSS, importance choice=1
    Fp, Nt, B = 512, 10, 3
    grid = rng.standard_normal((Fp, Nt, B)).astype(np.float32)
    farr_t = (np.linspace(0, 22050, Fp) / 44100).astype(np.float32)
    tarr = np.linspace(0, (0.5 * 1024 / 44100) * Nt, Nt).astype(np.float32)
    yb = np.arange(B)
    ds = ref_dataset.ESC_pc_temp(x=grid, y=yb, farr=farr_t, tarr=tarr)
    out["temp_clouds"] = np.stack([ds[i][0].numpy() for i in range(B)])
    ds = ref_dataset.ESC_pc_temp_maxKSS(x=grid, y=yb, farr=farr_t, tarr=tarr, K=77)
    out["temp_maxk_clouds"] = np.stack([ds[i][0].numpy() for i in range(B)])
    ds = ref_dataset.ESC_pc_temp_importancerandKSS(
        x=grid, y=yb, farr=farr_t, tarr=tarr, K=100, choice=1, winF=64)
    out["temp_imp_top_clouds"] = np.stack([ds[i][0].numpy() for i in range(B)])
    ds = ref_dataset.ESC_baseline_temporal_maxK(x=grid, y=yb, K=200, flag="max")
    out["temp_grid_maxk"] = np.stack([ds[i][1].numpy() for i in range(B)])
    out["grid"] = grid
    out["farr_t"] = farr_t
    out["tarr"] = tarr

    np.savez(os.path.join(OUT, "ops.npz"), **out)
    print("wrote ops.npz:", {k: v.shape for k, v in out.items()})

    split_golden()


def split_golden():
    """Reference tt_split outputs for fixed global seeds (Code/
    data_processing.py:40-65) — the split must be RNG-bit-compatible."""
    ref_dp = _load("ref_data_processing", os.path.join(REF, "Code", "data_processing.py"))
    paths = np.array([f"clip_{i:03d}.wav" for i in range(40)])
    labels = np.array([i % 4 for i in range(40)])
    out = {}
    for seed in (1, 5, 42):
        np.random.seed(seed)
        tr, ltr, te, lte = ref_dp.tt_split(paths, labels, f=0.8)
        out[f"s{seed}_train"] = np.array(tr)
        out[f"s{seed}_ltrain"] = np.array(ltr)
        out[f"s{seed}_test"] = np.array(te)
        out[f"s{seed}_ltest"] = np.array(lte)
    np.savez(os.path.join(OUT, "split.npz"), **out)
    print("wrote split.npz")


if __name__ == "__main__":
    main()
