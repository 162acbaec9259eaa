"""Reference-parity probe: train the REFERENCE torch ST on the synthetic
corpus clouds (saved by the head-to-head driver) with the reference
recipe (Adam lr 1e-3 wd 1e-3, CE, batch 128) and print the loss curve.

If the torch reference learns at the same (slow) rate as pcaudio's
trainer on identical data, the cycle's slow train stage is architecture-
characteristic, not a framework bug.
"""
import importlib.util
import sys
import time

import numpy as np
import torch


def load_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def main():
    torch.manual_seed(1)
    np.random.seed(1)
    sys.path.insert(0, "/root/reference/set_transformer-master")
    ref_models = load_module(
        "ref_code_models", "/root/reference/Code/models.py")

    d = np.load("/tmp/fst_clouds.npz")
    X, y = d["X"], d["y"]
    print("clouds:", X.shape, flush=True)

    model = ref_models.ST(dim_input=2, num_outputs=1, dim_output=10,
                          num_inds=64, dim_hidden=64, num_heads=8, ln=False)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3, weight_decay=1e-3)
    ce = torch.nn.CrossEntropyLoss()

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    for it in range(steps):
        idx = rng.integers(0, len(X), 128)
        xb = torch.from_numpy(X[idx])
        yb = torch.from_numpy(y[idx].astype(np.int64))
        logits = model(xb)
        loss = ce(logits, yb)
        opt.zero_grad()
        loss.backward()
        opt.step()
        if it % 25 == 0 or it == steps - 1:
            acc = (logits.argmax(-1) == yb).float().mean().item()
            print(f"it{it}: L={loss.item():.3f} a={acc:.2f} "
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
