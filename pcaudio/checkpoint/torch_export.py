"""Export flax parameters as reference-convention torch state_dicts.

Inverse of :mod:`pcaudio.checkpoint.torch_import`: models trained in pcaudio
can be saved as ``.pth`` files loadable by the reference PyTorch code
(``Code/models.py`` / ``set_transformer-master/modules.py``), including the
``module.`` DataParallel prefix the reference's FST/3ST checkpoints carry
(``Code/settransformer.py:94``).  Keeps the two ecosystems round-trippable.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

StateDict = Dict[str, np.ndarray]


def _dense(p: Mapping, prefix: str, out: StateDict) -> None:
    out[prefix + ".weight"] = np.ascontiguousarray(np.asarray(p["kernel"]).T)
    out[prefix + ".bias"] = np.asarray(p["bias"])


def _mab(p: Mapping, prefix: str, out: StateDict) -> None:
    for name in ("fc_q", "fc_k", "fc_v", "fc_o"):
        _dense(p[name], f"{prefix}.{name}", out)
    if "ln0" in p:
        out[prefix + ".ln0.weight"] = np.asarray(p["ln0"]["scale"])
        out[prefix + ".ln0.bias"] = np.asarray(p["ln0"]["bias"])
        out[prefix + ".ln1.weight"] = np.asarray(p["ln1"]["scale"])
        out[prefix + ".ln1.bias"] = np.asarray(p["ln1"]["bias"])


def st_state_dict(params: Any, data_parallel_prefix: bool = True) -> StateDict:
    """ST params → reference ``ST`` state_dict (``Code/models.py:13-44``)."""
    p = params["params"] if "params" in params else params
    out: StateDict = {}
    for i, enc in enumerate(("enc_0", "enc_1")):
        out[f"enc.{i}.I"] = np.asarray(p[enc]["I"])
        _mab(p[enc]["mab0"], f"enc.{i}.mab0", out)
        _mab(p[enc]["mab1"], f"enc.{i}.mab1", out)
    out["dec.0.S"] = np.asarray(p["dec_pma"]["S"])
    _mab(p["dec_pma"]["mab"], "dec.0.mab", out)
    _dense(p["dec_out"], "dec.1", out)
    if data_parallel_prefix:
        out = {f"module.{k}": v for k, v in out.items()}
    return out


def baseline_ff_state_dict(params: Any) -> StateDict:
    """BaselineFF params → reference ``baseline_ff`` state_dict
    (``Code/models.py:47-88``; FB checkpoints carry no DataParallel prefix)."""
    p = params["params"] if "params" in params else params
    out: StateDict = {}
    i = 0
    while f"enc_{i}" in p:
        _dense(p[f"enc_{i}"], f"ENC_NN.Encoder_Layer_{i}", out)
        i += 1
    _dense(p["code_linear"], "ENC_NN.Code_Linear", out)
    return out


def cnn_classifier_state_dict(params: Any) -> StateDict:
    """CNNClassifier params → reference ``CNN_classifier`` state_dict
    (``Code/models.py:91-119``)."""
    p = params["params"] if "params" in params else params
    out: StateDict = {
        "cnn.weight": np.asarray(p["cnn_kernel"]),
        "cnn.bias": np.asarray(p["cnn_bias"]),
    }
    i = 0
    while f"enc_{i}" in p:
        _dense(p[f"enc_{i}"], f"linear.Encoder_Layer_{i}", out)
        i += 1
    _dense(p["logits"], "linear.Logits", out)
    return out


def save_pth(state_dict: StateDict, path: str) -> None:
    """Write a torch-loadable ``.pth`` (requires torch)."""
    import torch

    torch.save({k: torch.tensor(v) for k, v in state_dict.items()}, path)
